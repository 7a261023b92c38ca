"""CLI runner: ``python -m chrono_tpu.run spec.yaml`` (the reference's
yaml_app analogue)."""

import sys

from chrono_tpu.io.yaml_spec import main

if __name__ == "__main__":
    sys.exit(main())
