"""torchvision shim — the reference imports `torchvision.models as models`
but never uses it in the Swin model files."""
from . import models  # noqa: F401
