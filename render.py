#!/usr/bin/env python
"""Drop-in rendering entry point: python render.py -m <model_path>."""
from sdpgs_tpu.cli.render_cli import main

if __name__ == "__main__":
    main()
