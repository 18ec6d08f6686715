from .transform import *  # noqa: F401,F403
from .transform import Transform, TransformList  # noqa: F401
