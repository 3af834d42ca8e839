"""Embedded code generation: emit a standalone dependency-free C++ project
with the solver state baked in (the reference codegen system's analog,
SURVEY.md §2.3 'Codegen emitter')."""
from . import emitter  # noqa: F401
from .emitter import codegen  # noqa: F401
