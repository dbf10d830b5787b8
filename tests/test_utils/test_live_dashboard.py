"""Live training dashboard (role of tb_visualizer.py:10-76 babysitting)."""
import json
import os
import urllib.request

import numpy as np


def test_dashboard_serves_metrics_and_panels(tmp_path):
    from ipercore_tpu.utils.live_dashboard import LiveDashboard

    log = tmp_path / "train_log.jsonl"
    with open(log, "w") as f:
        for i in range(20):
            f.write(json.dumps({"t": i, "step": i,
                                "g_total": 3.0 - 0.1 * i,
                                "d_total": 1.0 + 0.01 * i}) + "\n")
    panels = tmp_path / "panels"
    panels.mkdir()
    from ipercore_tpu.utils import video as vid

    vid.save_image(str(panels / "panel_iter_00000001.png"),
                   np.zeros((8, 8, 3), np.float32))

    dash = LiveDashboard(str(log), str(panels), port=0).start()
    try:
        base = f"http://127.0.0.1:{dash.port}"
        page = urllib.request.urlopen(base + "/", timeout=10).read().decode()
        assert "g_total" in page and "d_total" in page
        assert "polyline" in page  # the SVG loss curve
        assert "panel_iter_00000001.png" in page
        png = urllib.request.urlopen(
            base + "/panel/panel_iter_00000001.png", timeout=10).read()
        assert png[:4] == b"\x89PNG"
        # path traversal is rejected (basename-only lookup)
        try:
            urllib.request.urlopen(base + "/panel/../train_log.jsonl", timeout=10)
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        dash.stop()
