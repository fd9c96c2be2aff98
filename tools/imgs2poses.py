#!/usr/bin/env python
"""imgs2poses: COLMAP SfM -> poses_bounds.npy for a scene directory.

CLI parity with `DS_NeRF/imgs2poses.py:1-18`:
    python tools/imgs2poses.py <scenedir> [--match_type exhaustive_matcher]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mvip_tpu.data.pose_pipeline import gen_poses


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("scenedir", type=str)
    parser.add_argument(
        "--match_type", type=str, default="exhaustive_matcher",
        choices=["exhaustive_matcher", "sequential_matcher"],
    )
    parser.add_argument("--colmap_bin", type=str, default=None)
    args = parser.parse_args()
    arr = gen_poses(args.scenedir, args.match_type, args.colmap_bin)
    print(f"wrote poses_bounds.npy: {arr.shape}")


if __name__ == "__main__":
    main()
