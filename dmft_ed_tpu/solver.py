"""Solver orchestration (placeholder; filled in as modules land)."""


class EDSolver:  # pragma: no cover - replaced shortly
    pass
