import sys

from ai2bmd_tpu.cli import main

sys.exit(main())
