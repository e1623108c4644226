#!/usr/bin/env python
"""Evaluation CLI (reference experiments/testing_model.py:37-50 flag surface):
--config / --model / --genotype / --loss / --depth / --batch_size / --resume.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from senas_tpu.core.config import load_config
from senas_tpu.runner.test import TestRunner

DEFAULT_GENOTYPE = (
    "Genotype(down=[('se_conv_3', 1), ('avg_pool', 0), ('dil_3_conv_5', 2), "
    "('dep_sep_conv_5', 1), ('dil_3_conv_5', 2), ('avg_pool', 0), ('avg_pool', 1), "
    "('dil_3_conv_5', 3)], down_concat=range(2, 6), up=[('up_sample', 1), "
    "('dil_3_conv_5', 0), ('dil_3_conv_5', 0), ('dil_2_conv_5', 2), "
    "('dil_3_conv_5', 1), ('dil_2_conv_5', 2), ('dep_sep_conv_3', 0), "
    "('dil_2_conv_5', 4)], up_concat=range(2, 6), gamma=[0, 0, 0, 1, 1, 1])"
)


def main():
    parser = argparse.ArgumentParser(description="senas-tpu model evaluation")
    parser.add_argument("--config", nargs="?", type=str,
                        default="../configs/senas/senas_chaos.yml")
    parser.add_argument("--model", nargs="?", type=str, default="senas")
    parser.add_argument("--genotype", nargs="?", type=str, default=DEFAULT_GENOTYPE)
    parser.add_argument("--loss", nargs="?", type=str, default="")
    parser.add_argument("--depth", nargs="?", type=int, default=-1)
    parser.add_argument("--batch_size", nargs="?", type=int, default=6)
    parser.add_argument("--resume", nargs="?", type=str, default=None,
                        help="checkpoint directory to evaluate")
    parser.add_argument("--data_root", nargs="?", type=str,
                        default=os.environ.get("SENAS_DATA_ROOT", "../data/imgseg/"))
    parser.add_argument("--log_root", nargs="?", type=str,
                        default=os.environ.get("SENAS_LOG_ROOT", "../logs"))
    args = parser.parse_args()

    cfg = load_config(args.config)
    if args.loss:
        cfg["training"].setdefault("loss", {})
        cfg["training"]["loss"]["name"] = args.loss
    if args.depth > 0:
        cfg["training"]["depth"] = args.depth

    runner = TestRunner(cfg, model_name=args.model, genotype_str=args.genotype,
                        resume=args.resume, config_path=args.config,
                        data_root=args.data_root, log_root=args.log_root,
                        batch_size=args.batch_size)
    print(runner.run())


if __name__ == "__main__":
    main()
