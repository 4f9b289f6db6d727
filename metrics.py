#!/usr/bin/env python
"""Drop-in metrics entry point: python metrics.py -m <model_path>..."""
from sdpgs_tpu.cli.metrics_cli import main

if __name__ == "__main__":
    main()
