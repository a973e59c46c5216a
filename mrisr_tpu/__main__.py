"""``python -m mrisr_tpu`` -> the CLI."""

from mrisr_tpu.cli import main

if __name__ == "__main__":
    main()
