"""Plan-module initialization.

Importing ANY module in this package triggers this __init__ first, which
loads `registry` and then every plan module in dependency order. The
module list used to live at the BOTTOM of registry.py, which broke
direct imports of a plan module (e.g. `import ...plans.retrieval`):
retrieval -> registry -> (bottom imports) -> round6b ->
`from .retrieval import _BM25_SQL` found retrieval PARTIALLY initialized
(stopped at its own `from .registry import register` line) and raised
ImportError. From __init__, each module completes before any later
module imports from it. Order matters: a module may import module-level
names only from modules listed ABOVE it."""

from . import registry  # noqa: F401  (the @register decorator)

from . import extended as _extended  # noqa: E402,F401
from . import udf_and_scale as _udf_and_scale  # noqa: E402,F401
from . import llm_text as _llm_text  # noqa: E402,F401  (needs udf_and_scale)
from . import pipelines as _pipelines  # noqa: E402,F401
from . import coverage_extra as _coverage_extra  # noqa: E402,F401
from . import scale_patterns as _scale_patterns  # noqa: E402,F401
from . import sql_api as _sql_api  # noqa: E402,F401
from . import iterative as _iterative  # noqa: E402,F401
from . import decontam as _decontam  # noqa: E402,F401
from . import coverage_tpch as _coverage_tpch  # noqa: E402,F401
from . import coverage_tpch2 as _coverage_tpch2  # noqa: E402,F401
from . import sources_extra as _sources_extra  # noqa: E402,F401
from . import trainset as _trainset  # noqa: E402,F401
from . import coverage_tpch3 as _coverage_tpch3  # noqa: E402,F401
from . import coverage_tpch4 as _coverage_tpch4  # noqa: E402,F401
from . import semistructured as _semistructured  # noqa: E402,F401
from . import quality as _quality  # noqa: E402,F401
from . import corpus_ops as _corpus_ops  # noqa: E402,F401
from . import behavioral as _behavioral  # noqa: E402,F401
from . import ann_pq as _ann_pq  # noqa: E402,F401
from . import corpus_eval as _corpus_eval  # noqa: E402,F401  (needs llm_text)
from . import multimodal_audio as _multimodal_audio  # noqa: E402,F401
from . import graph_ops as _graph_ops  # noqa: E402,F401
from . import bpe as _bpe  # noqa: E402,F401
from . import corpus_select as _corpus_select  # noqa: E402,F401
from . import retrieval as _retrieval  # noqa: E402,F401
from . import semantic_dedup as _semantic_dedup  # noqa: E402,F401
from . import insights as _insights  # noqa: E402,F401
from . import linalg as _linalg  # noqa: E402,F401
from . import patterns as _patterns  # noqa: E402,F401
from . import ml_eval as _ml_eval  # noqa: E402,F401  (needs trainset, corpus_eval)
from . import round5 as _round5  # noqa: E402,F401
from . import round6 as _round6  # noqa: E402,F401
from . import round6b as _round6b  # noqa: E402,F401
from . import round6c as _round6c  # noqa: E402,F401
from . import round6d as _round6d  # noqa: E402,F401
from . import round6e as _round6e  # noqa: E402,F401
from . import round6f as _round6f  # noqa: E402,F401
from . import round6g as _round6g  # noqa: E402,F401
from . import round7 as _round7  # noqa: E402,F401  (needs insights, retrieval)
from . import round7b as _round7b  # noqa: E402,F401
from . import round7c as _round7c  # noqa: E402,F401
from . import round7d as _round7d  # noqa: E402,F401
from . import round7e as _round7e  # noqa: E402,F401
from . import round8 as _round8  # noqa: E402,F401  (needs bpe, retrieval)
from . import round8b as _round8b  # noqa: E402,F401
from . import round8c as _round8c  # noqa: E402,F401
from . import round9 as _round9  # noqa: E402,F401
from . import round9d as _round9d  # noqa: E402,F401
from . import round9e as _round9e  # noqa: E402,F401  (needs graph_ops, semantic_dedup)
from . import round9f as _round9f  # noqa: E402,F401  (needs semantic_dedup)
from . import round10 as _round10  # noqa: E402,F401  (needs ann_pq, trainset)
from . import round10b as _round10b  # noqa: E402,F401  (needs trainset)
