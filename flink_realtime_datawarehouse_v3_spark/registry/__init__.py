"""Registry package: one module per query family, imported IN ORDER.

Import order IS registration order (the driver checks the first 50
registered entries); never reorder these imports without rebuilding
the driver window (tools/rebuild_window.py).
"""

from . import _core  # noqa: F401,E402
from . import m01_dwd  # noqa: F401,E402
from . import m02_dws  # noqa: F401,E402
from . import m03_joins  # noqa: F401,E402
from . import m04_tpch  # noqa: F401,E402
from . import m05_dim  # noqa: F401,E402
from . import m06_training_text  # noqa: F401,E402
from . import m07_training_models  # noqa: F401,E402
from . import m08_training_embed  # noqa: F401,E402
from . import m09_audit_pyds  # noqa: F401,E402
from . import m10_retract_linkage  # noqa: F401,E402
from . import m11_streaming  # noqa: F401,E402
from . import driver_order  # noqa: F401,E402
