from cuda_gcn_tpu.data.parser import CSR, GCNDataset, load_dataset
from cuda_gcn_tpu.data.graph import Graph, build_graph
from cuda_gcn_tpu.data.synthetic import make_synthetic, write_dataset

__all__ = ["CSR", "GCNDataset", "load_dataset", "Graph", "build_graph",
           "make_synthetic", "write_dataset"]
