"""Model families. Importing this package registers all models."""

from cap2det_tpu.models import registry  # noqa: F401
from cap2det_tpu.models import text_model  # noqa: F401

try:  # The detection model needs the vision stack; keep text-only usable.
    from cap2det_tpu.models import cap2det  # noqa: F401
except ImportError:  # pragma: no cover
    pass
