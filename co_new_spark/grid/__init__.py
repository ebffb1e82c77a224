"""Pure numpy grid core (no Spark imports) — projection, Morton, codecs, cells.

This package is the trustworthy kernel layer (SURVEY.md §7 M1); everything
Spark-side composes it through Arrow-batched pandas UDFs.
"""

from . import cells, codec, grids, morton, proj  # noqa: F401
