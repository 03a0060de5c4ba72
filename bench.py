#!/usr/bin/env python3
"""Benchmark driver entry point -- delegates to tpurast.cli (the
installable `tpurast-bench` console script). See tpurast/cli.py for the
methodology notes (device-side frame timing, honest present loop,
overflow accounting)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tpurast.cli import main

if __name__ == "__main__":
    sys.exit(main())
