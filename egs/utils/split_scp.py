#!/usr/bin/env python3
"""Split an scp file into N roughly equal shards (kaldi split_scp.pl twin).

Usage: split_scp.py in.scp out1.scp out2.scp ...
"""

import sys


def main():
    src, outs = sys.argv[1], sys.argv[2:]
    with open(src) as f:
        lines = [ln for ln in f if ln.strip()]
    n = len(outs)
    for i, path in enumerate(outs):
        with open(path, "w") as f:
            f.writelines(lines[i::n])


if __name__ == "__main__":
    main()
