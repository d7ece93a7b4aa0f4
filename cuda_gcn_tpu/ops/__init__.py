from cuda_gcn_tpu.ops.graphsum import graphsum
from cuda_gcn_tpu.ops.loss import l2_penalty, masked_cross_entropy, strict_accuracy
from cuda_gcn_tpu.ops.matmul import csr_matmul, dense_matmul
from cuda_gcn_tpu.ops.dropout import dropout

__all__ = ["graphsum", "masked_cross_entropy", "strict_accuracy", "l2_penalty",
           "dense_matmul", "csr_matmul", "dropout"]
