"""``python -m deepgrp_tpu`` entry point."""

from deepgrp_tpu.cli import main

if __name__ == "__main__":
    main()
