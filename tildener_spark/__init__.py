"""tildener_spark — a from-scratch, PySpark-native knowledge-graph
construction engine with the capabilities of accurat-toolkit/TildeNER.

The reference (read-only at /root/reference/) is ~5.4k lines of Perl
orchestrating per-file subprocesses (Stanford CRF, TreeTagger).  This
engine re-expresses those *semantics* — the 10-column token data model
(Sample_Data/LV_Training_prop_template.prop:56), BIO span assembly
(NERefinements.pm:219-286), the post-tagging refinement heuristics
(NERefinements.pm:23-102), gazetteer logic (NEUtilities.pm:561-604) and
the MUC-7 evaluator (NEEvaluation_v2.pl) — as declarative DataFrame
plans plus a small number of document-local pandas/Arrow UDFs, and adds
the KG stages mandated by the north rule: triple extraction, minhash-LSH
entity linking, connected-component canonicalization and partitioned
graph materialization.

Design rules (see SURVEY.md §4.3/§7):
  * DataFrame + built-in functions first; Catalyst does the optimizing.
  * pandas/Arrow UDFs only for document-local, order-exact semantics;
    never per-row Python.
  * One document never spans partitions (tokens stay nested per page
    row until spans are assembled).
  * Gazetteers are broadcast; skewed self-joins are salted; AQE on.
"""

__version__ = "0.1.0"

from tildener_spark.config import EngineConfig  # noqa: F401
from tildener_spark.session import get_spark  # noqa: F401
