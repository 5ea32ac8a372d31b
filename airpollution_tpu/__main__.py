"""``python -m airpollution_tpu`` entry point (see cli.py)."""

from airpollution_tpu.cli import main

main()
