"""Statistical models: design matrices, OLS, mixed models, FDR."""
from mba_tpu.models.formula import build_design_matrix, build_formula  # noqa: F401
from mba_tpu.models.ols import fit_ols  # noqa: F401
from mba_tpu.models.lme import (  # noqa: F401
    fit_random_intercept_reml, batched_lme_pvalues,
)
from mba_tpu.models.fdr import benjamini_hochberg  # noqa: F401
