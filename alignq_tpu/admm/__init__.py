from alignq_tpu.admm.correlation import corr, corr_discrepancy
from alignq_tpu.admm.loss import admm_loss, ADMMConfig
from alignq_tpu.admm.state import ADMMSiteState, init_site, dual_update

__all__ = [
    "corr",
    "corr_discrepancy",
    "admm_loss",
    "ADMMConfig",
    "ADMMSiteState",
    "init_site",
    "dual_update",
]
