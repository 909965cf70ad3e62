import sys

from qkd_ldpc_tpu.cli import main

sys.exit(main())
