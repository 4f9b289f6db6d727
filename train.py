#!/usr/bin/env python
"""Drop-in training entry point: python train.py -s <scene> -m <out>."""
from sdpgs_tpu.cli.train_cli import main

if __name__ == "__main__":
    main()
