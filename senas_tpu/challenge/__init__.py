"""Challenge-specific evaluation and submission tooling.

Parity targets: /root/reference/utils/challenge/promise12/ (volumetric
metrics + MHD submission writer) and /root/reference/utils/challenge/nerve/
(run-length encoding + incoherent-image filter).
"""

from senas_tpu.challenge.promise12 import (  # noqa: F401
    numpy_dice,
    predict_test,
    rel_abs_vol_diff,
    surface_distances,
    volumetric_metrics,
)
from senas_tpu.challenge.nerve import (  # noqa: F401
    hard_dice,
    rle_encoding,
    write_rle_submission,
)
