from .cavi import cavi_step, elog_tables, phi_segment_sums, run_cavi_block  # noqa: F401
from .metrics import llk_rmse_sums, predict_pairs, sum_pairs_prediction  # noqa: F401
