from .disco import DISCO, DISCOData, DISCOState  # noqa: F401
from .dust import DuSt, DuStData, DuStState  # noqa: F401
