import sys

from bwt_tpu.cli import main

sys.exit(main())
