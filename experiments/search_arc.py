#!/usr/bin/env python
"""Supernet architecture search CLI.

Flag surface matches the reference experiments/search_arc.py:37-48:
--config / --batch_size / --meta_node_num (argparse overrides onto the
`searching:` section of the YAML config).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from senas_tpu.core.config import load_config
from senas_tpu.runner.search import SearchRunner


def main():
    parser = argparse.ArgumentParser(description="senas-tpu supernet search")
    parser.add_argument("--config", nargs="?", type=str,
                        default="../configs/senas/senas_promise12.yml",
                        help="Configuration file to use")
    parser.add_argument("--batch_size", nargs="?", type=int, default=-1,
                        help="Batch size")
    parser.add_argument("--meta_node_num", nargs="?", type=int, default=-1,
                        help="Meta node number")
    parser.add_argument("--data_root", nargs="?", type=str,
                        default=os.environ.get("SENAS_DATA_ROOT", "../data/imgseg/"))
    parser.add_argument("--log_root", nargs="?", type=str,
                        default=os.environ.get("SENAS_LOG_ROOT", "../logs"))
    parser.add_argument("--epoch", nargs="?", type=int, default=-1)
    args = parser.parse_args()

    cfg = load_config(args.config)
    if args.batch_size > 0:
        cfg["searching"]["batch_size"] = args.batch_size
    if args.meta_node_num > 0:
        cfg["searching"]["meta_node_num"] = args.meta_node_num
    if args.epoch > 0:
        cfg["searching"]["epoch"] = args.epoch

    runner = SearchRunner(cfg, config_path=args.config, data_root=args.data_root,
                          log_root=args.log_root)
    best = runner.run()
    print("best genotype:", best)


if __name__ == "__main__":
    main()
