"""``python -m timesearch_spark <subcommand>`` — see cli.py."""

import sys

from timesearch_spark.cli import main

sys.exit(main())
