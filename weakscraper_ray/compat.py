"""Reference-shaped API: ``WeakScraper(template_string, functions).scrap(html)``.

Mirrors the public ``y2kconnect/weakscraper`` entry point
(``weakscraper/weakscraper.py::WeakScraper``, reconstructed —
SURVEY.md §3.1/§3.2) so a user of the reference can switch with no
code change for the single-document path. ``scrap`` returns the
results dict and lets ``TemplateMismatch`` propagate, exactly like the
reference lets its mismatch exceptions reach the caller.
"""

from __future__ import annotations

from typing import Callable

from .template import MatchResult, Template


class WeakScraper:
    def __init__(self, template_string: str, functions: dict[str, Callable] | None = None,
                 nested: bool = False):
        """``nested=True`` returns results keyed by the template's
        wp-name hierarchy (the reconstructed reference shape) instead
        of the engine's default flat dict — see template.py docstring."""
        self.template = Template(template_string, functions, nested=nested)

    def scrap(self, html_string: str) -> dict:
        """One document in, one results dict out (mismatch raises)."""
        return self.template.match(html_string).fields

    def scrap_full(self, html_string: str) -> MatchResult:
        """Engine extension: results + extracted_text + spans + metrics."""
        return self.template.match(html_string)
