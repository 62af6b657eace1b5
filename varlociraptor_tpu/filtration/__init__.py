from .fdr import control_fdr  # noqa: F401
from .posterior_odds import filter_by_odds  # noqa: F401
