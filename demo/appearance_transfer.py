"""Appearance transfer CLI — parity with the reference `demo/appearance_transfer.py`.

Usage:
    python demo/appearance_transfer.py --image_size 512 --num_source 2 \
        --output_dir ./results --model_id swap \
        --src_path "path?=./person_A,name?=A|path?=./person_B,name?=B,parts?=upper" \
        --ref_path "path?=./dance.mp4,name?=dance"

The first source is primary (keeps all unclaimed parts); later sources claim
the parts listed in their `parts?=` key (mini-language parity with
`meta_info.parse_parts_str`).
"""
import sys

sys.path.insert(0, ".")

from ipercore_tpu.services.run_swapper import main  # noqa: E402

if __name__ == "__main__":
    outputs = main()
    for o in outputs or []:
        print(f"output: {o}")
