"""`python -m nanohevc_tpu` entry point (parity: python -m nano_hevc)."""

from nanohevc_tpu.cli import main

main()
