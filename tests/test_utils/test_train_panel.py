"""Image-panel visualizer (the reference's TBVisualizer image rows,
`tb_visualizer.py:38-76`)."""
import numpy as np

from ipercore_tpu.utils.visualizer import save_train_panel
from ipercore_tpu.utils import video as vid


def test_save_train_panel_grid(tmp_path):
    rng = np.random.RandomState(0)
    rows = {
        "src": rng.uniform(-1, 1, (3, 16, 16, 3)).astype(np.float32),
        "mask": rng.uniform(0, 1, (3, 16, 16, 1)).astype(np.float32),
    }
    p = save_train_panel(str(tmp_path / "p" / "panel.png"), rows)
    img = vid.load_image(p)
    assert img.shape == (32, 48, 3)  # 2 rows x 3 cols of 16x16
