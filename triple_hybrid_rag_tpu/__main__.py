"""``python -m triple_hybrid_rag_tpu`` -> the thr CLI."""

import sys

from .cli import main

sys.exit(main())
