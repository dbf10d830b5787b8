"""Novel-view synthesis CLI — parity with the reference `demo/novel_view.py`.

Usage:
    python demo/novel_view.py --image_size 512 --num_source 2 \
        --output_dir ./results --model_id subject \
        --src_path "path?=./imgs_of_person" [--T_pose]
"""
import sys

sys.path.insert(0, ".")

from ipercore_tpu.services.run_viewer import main  # noqa: E402

if __name__ == "__main__":
    outputs = main()
    for o in outputs or []:
        print(f"output: {o}")
