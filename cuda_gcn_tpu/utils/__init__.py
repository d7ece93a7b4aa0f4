from cuda_gcn_tpu.utils.timer import PhaseTimer, timers

__all__ = ["PhaseTimer", "timers"]
