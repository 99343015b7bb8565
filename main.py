#!/usr/bin/env python
"""Train/eval entry point (flag-compatible with the reference main.py)."""

from vaw_tpu.cli.main import main

if __name__ == "__main__":
    main()
