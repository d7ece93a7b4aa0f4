from cuda_gcn_tpu.models import gcn

__all__ = ["gcn"]
