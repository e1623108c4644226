"""Build the native data-pipeline extension: python -m senas_tpu.data.native.build"""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "augment_native.cpp")
OUT = os.path.join(HERE, "libsenas_native.so")


def build(verbose: bool = True) -> str:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", SRC, "-o", OUT]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return OUT


if __name__ == "__main__":
    path = build()
    print(f"built {path}")
    sys.exit(0)
