from .likelihoods import ExponentiatedUtility, GaussianLikelihood, GaussianObs  # noqa: F401
from .mpf import MPF, MPFState  # noqa: F401
from .score import pathsig_score, sgd_score, svgd_score  # noqa: F401
from .svgd import (  # noqa: F401
    RunData,
    ScaledSVGD,
    ScoreFn,
    ScoreResult,
    SVGD,
    SVGDState,
    lbfgs,
    matrix_svgd,
    roll_opt_state,
)
