"""Central query manifest: importing this module registers every queries()
entry — relational surface, pipeline operators, streaming — into
:data:`limeqo_spark.relational.registry.REGISTRY`."""

import limeqo_spark.pipeline  # noqa: F401
import limeqo_spark.relational  # noqa: F401

try:  # streaming queries register themselves; keep import-gated during build
    import limeqo_spark.streaming  # noqa: F401
except ImportError:  # pragma: no cover
    pass

from limeqo_spark.relational.registry import REGISTRY, QuerySpec  # noqa: F401
