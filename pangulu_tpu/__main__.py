"""`python -m pangulu_tpu` == the CLI driver."""

import sys

from pangulu_tpu.cli import main

sys.exit(main())
