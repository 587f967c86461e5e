from .rbf import (  # noqa: F401
    BaseKernel,
    GaussianKernel,
    IMQKernel,
    ScaledGaussianKernel,
    ScaledIMQKernel,
)
from .signature import PathSigKernel, batch_signature, sig_dim, signature  # noqa: F401
from .sigkernel import (  # noqa: F401
    SignatureKernel,
    gram_increments,
    solve_goursat_pde,
    static_gram_linear,
    static_gram_rbf,
)
