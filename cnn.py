#!/usr/bin/env python
"""Launcher for the cnn_sr_tpu CLI (the reference's ``bin/cnn.exe``):

    python cnn.py [train] [dry] [profile] -c cfg.json -i <in> [-o <out>] [-e N]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# CNN_SR_PLATFORM=cpu forces a platform even when a sitecustomize hook
# pre-registers a TPU backend and pins jax_platforms past the JAX_PLATFORMS
# env var (as the axon tunnel does).
_platform = os.environ.get("CNN_SR_PLATFORM")
if _platform:
    import jax

    jax.config.update("jax_platforms", _platform)

from cnn_sr_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main())
