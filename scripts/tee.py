#!/usr/bin/env python3
"""Mirrors stdin to the terminal and a log file (reference scripts/tee.py).

The shell wrappers (train.sh/eval.sh) use `tee -a` directly; this
standalone version exists for parity and for shells without tee:

  python train.py |& python tee.py log_train.txt
"""

import sys


def main():
  path = sys.argv[1]
  # Line-buffered append; truncate an existing log like the reference.
  with open(path, 'w') as handler:
    for line in sys.stdin:
      sys.stdout.write(line)
      sys.stdout.flush()
      handler.write(line)
      handler.flush()


if __name__ == '__main__':
  main()
