"""The graded query suite, split by family (r6; was one 7.6k-line module).

Importing this package populates SUITE/ORACLES: suite.common defines the
registries + shared helpers; each family module registers its entries via
the @query decorator at import time. The flat pre-split namespace is
preserved — every helper and entry function is importable from
`logverzcore_spark.suite` exactly as before (zero renames).

Import-order subtlety: common star-exports `dedup`/`similarity`/`text`
as the OPERATORS modules (the flat suite's aliases), which shadow the
same-named suite submodules on the package object — so the registration
imports below must be full dotted `import` statements (which always load
the submodule) rather than `from . import x` (which would return the
shadowing attribute and silently skip registration).
"""

from logverzcore_spark.suite.common import *  # noqa: F401,F403

import logverzcore_spark.suite.dedup as _sm_dedup  # noqa: E402
import logverzcore_spark.suite.multimodal as _sm_multimodal  # noqa: E402
import logverzcore_spark.suite.relational as _sm_relational  # noqa: E402
import logverzcore_spark.suite.similarity as _sm_similarity  # noqa: E402
import logverzcore_spark.suite.sketches as _sm_sketches  # noqa: E402
import logverzcore_spark.suite.text as _sm_text  # noqa: E402

# streaming loads AFTER text: st29/st30 reuse s18/t53 oracles from the
# ORACLES registry at decoration time.
import logverzcore_spark.suite.streaming as _sm_streaming  # noqa: E402

# The dotted imports above also rebind the shadowed package attributes
# (suite.dedup is now the SUBMODULE, not operators.dedup) — restore the
# flat namespace so `suite.dedup`/`suite.text`/`suite.similarity` keep
# meaning what they meant before the split.
from logverzcore_spark.operators import (  # noqa: E402
    dedup, similarity, text,
)

# Re-export each family's own defs (the @query entry functions) so
# `from logverzcore_spark.suite import st21_streaming_quota_cap` keeps
# working; names imported FROM common are skipped (already bound above).
for _m in (_sm_relational, _sm_sketches, _sm_dedup, _sm_similarity,
           _sm_text, _sm_multimodal, _sm_streaming):
    for _k, _v in vars(_m).items():
        if getattr(_v, "__module__", None) == _m.__name__:
            globals()[_k] = _v
del _m, _k, _v
