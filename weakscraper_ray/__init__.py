"""weakscraper_ray — a Ray-Data-native template-extraction engine.

Brand-new implementation (NOT a port) with the query/data-processing
capabilities of the public ``y2kconnect/weakscraper`` library, applied
to Parquet tables of multi-turn transcripts at large scale. See
SURVEY.md for the blueprint and BASELINE.json for the north star.

Layers:
- pure Python core (no Ray): :mod:`dom`, :mod:`template`,
  :mod:`exceptions`, :mod:`compat`, :mod:`learner`, :mod:`render`
- Ray Data stages (:mod:`stages`), sources/sinks + checkpointing
  (:mod:`sources`), scalar/UDF families (:mod:`functions`), end-to-end
  pipelines (:mod:`pipelines`), worker-state helpers (:mod:`state`).

Nothing in this package calls ``ray.init`` — the driver, ``bench.py``
and the test fixture own the Ray session.
"""

from .compat import WeakScraper
from .dom import parse, text_content
from .exceptions import TemplateError, TemplateMismatch
from .template import MatchResult, Template

__all__ = [
    "WeakScraper",
    "Template",
    "MatchResult",
    "TemplateError",
    "TemplateMismatch",
    "parse",
    "text_content",
]

__version__ = "0.1.0"
