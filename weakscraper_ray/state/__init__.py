"""Worker-state helpers: the multi-template registry (SURVEY.md ST3)."""

from .registry import TemplateRegistry, load_template_dir

__all__ = ["TemplateRegistry", "load_template_dir"]
