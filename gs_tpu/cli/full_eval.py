"""Full evaluation harness — parity with the reference ``full_eval.py:15-75``.

Orchestrates train -> render (7k & 30k) -> metrics over the paper's 13 scenes
(MipNeRF360 outdoor/indoor, Tanks&Temples, DeepBlending).
"""

from __future__ import annotations

import os
import sys
from argparse import ArgumentParser

# scene lists (full_eval.py:15-18)
MIPNERF360_OUTDOOR = ["bicycle", "flowers", "garden", "stump", "treehill"]
MIPNERF360_INDOOR = ["room", "counter", "kitchen", "bonsai"]
TANKS_AND_TEMPLES = ["truck", "train"]
DEEP_BLENDING = ["drjohnson", "playroom"]


def main(argv=None):
    parser = ArgumentParser(description="Full evaluation script parameters")
    parser.add_argument("--skip_training", action="store_true")
    parser.add_argument("--skip_rendering", action="store_true")
    parser.add_argument("--skip_metrics", action="store_true")
    parser.add_argument("--output_path", default="./eval")
    parser.add_argument("--mipnerf360", "-m360", default="", type=str)
    parser.add_argument("--tanksandtemples", "-tat", default="", type=str)
    parser.add_argument("--deepblending", "-db", default="", type=str)
    args = parser.parse_args(sys.argv[1:] if argv is None else argv)

    scenes = []
    if args.mipnerf360:
        scenes += [(args.mipnerf360, s, "-i images_4") for s in MIPNERF360_OUTDOOR]
        scenes += [(args.mipnerf360, s, "-i images_2") for s in MIPNERF360_INDOOR]
    if args.tanksandtemples:
        scenes += [(args.tanksandtemples, s, "") for s in TANKS_AND_TEMPLES]
    if args.deepblending:
        scenes += [(args.deepblending, s, "") for s in DEEP_BLENDING]
    if not scenes:
        parser.error("no dataset roots given (-m360 / -tat / -db)")

    py = sys.executable
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    if not args.skip_training:
        common = " --quiet --eval --test_iterations -1"
        for root, scene, extra in scenes:
            src = os.path.join(root, scene)
            out = os.path.join(args.output_path, scene)
            os.system(
                f"{py} {here}/train.py -s {src} {extra} -m {out}{common}"
            )

    if not args.skip_rendering:
        for root, scene, _ in scenes:
            src = os.path.join(root, scene)
            out = os.path.join(args.output_path, scene)
            for it in (7000, 30000):
                os.system(
                    f"{py} {here}/render.py --iteration {it} -s {src} -m {out}"
                    " --quiet --eval --skip_train"
                )

    if not args.skip_metrics:
        paths = " ".join(
            '"' + os.path.join(args.output_path, scene) + '"'
            for _, scene, _ in scenes
        )
        os.system(f"{py} {here}/metrics.py -m {paths}")


if __name__ == "__main__":
    main()
