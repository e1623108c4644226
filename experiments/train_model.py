#!/usr/bin/env python
"""Fixed-model training CLI.

Flag surface matches the reference experiments/train_model.py:41-60:
--config / --model / --ft / --genotype / --loss / --depth / --batch_size.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from senas_tpu.core.config import load_config
from senas_tpu.runner.train import TrainRunner


def main():
    parser = argparse.ArgumentParser(description="senas-tpu model training")
    parser.add_argument("--config", nargs="?", type=str,
                        default="../configs/senas/senas_chaos.yml",
                        help="Configuration file to use")
    parser.add_argument("--model", nargs="?", type=str, default="senas",
                        help="Model to train and evaluation")
    parser.add_argument("--ft", action="store_true", default=False,
                        help="fine tuning on a different dataset")
    parser.add_argument("--genotype", nargs="?", type=str, default="",
                        help="Model architecture (genotype string)")
    parser.add_argument("--loss", nargs="?", type=str, default="",
                        help="Loss function")
    parser.add_argument("--depth", nargs="?", type=int, default=-1)
    parser.add_argument("--batch_size", nargs="?", type=int, default=-1)
    parser.add_argument("--epoch", nargs="?", type=int, default=-1)
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
    if args.batch_size > 0:
        cfg["training"]["batch_size"] = args.batch_size
    if args.epoch > 0:
        cfg["training"]["epoch"] = args.epoch

    runner = TrainRunner(cfg, model_name=args.model, genotype_str=args.genotype,
                         config_path=args.config, data_root=args.data_root,
                         log_root=args.log_root, ft=args.ft)
    result = runner.run()
    print("best:", result)


if __name__ == "__main__":
    main()
