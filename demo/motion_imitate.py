"""Motion imitation CLI — parity with the reference `demo/motion_imitate.py`.

Usage:
    python demo/motion_imitate.py --gpu_ids 0 --image_size 512 --num_source 2 \
        --output_dir ./results --model_id donald_trump_2 \
        --src_path "path?=./assets/samples/sources/donald_trump_2" \
        --ref_path "path?=./assets/samples/references/akun_1.mp4,name?=akun_1,pose_fc?=300"

(The `--gpu_ids` flag is accepted for CLI compatibility and ignored — device
selection is JAX's.) Unlike the reference (`demo/motion_imitate.py:119-133`),
no subprocess hop: the service runs in-process.
"""
import sys

sys.path.insert(0, ".")

from ipercore_tpu.services.run_imitator import main  # noqa: E402

if __name__ == "__main__":
    outputs = main()
    for o in outputs or []:
        print(f"output: {o}")
