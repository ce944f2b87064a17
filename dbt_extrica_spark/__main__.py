"""``python -m dbt_extrica_spark`` — see :mod:`dbt_extrica_spark.cli`."""

import sys

from .cli import main

sys.exit(main())
