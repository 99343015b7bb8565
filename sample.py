#!/usr/bin/env python
"""Sampling entry point (flag-compatible with the reference sample.py)."""

from vaw_tpu.cli.sample import main

if __name__ == "__main__":
    main()
