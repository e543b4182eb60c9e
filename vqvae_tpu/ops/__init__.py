from .ivf import knn_search_ivf
from .knn import knn_search
from .graph import (
    build_knn_graph,
    build_knn_graph_auto,
    largest_connected_component,
    symmetric_csr_from_edges,
    analyze_graph_connectivity,
)
from .shortest_paths import (
    multi_source_shortest_paths,
    single_source_shortest_paths,
    distances_between,
)
from .connected import connected_components_device
from .kmedoids import (
    fit_kmedoids,
    kpp_initialization,
    kpp_parallel_initialization,
    assign_points_to_medoids,
    compute_quantization_error,
)
from .riemannian import (build_mlp_decode_fn, edge_lengths_riemannian,
                         edge_lengths_riemannian_auto,
                         edge_lengths_riemannian_indexed,
                         edge_lengths_riemannian_nodal)
from .ell import BucketedGraph, multi_source_shortest_paths_ell
from .kmeans_euclidean import fit_kmeans
from .pallas_assign import nearest_codes
from . import geo_compat

__all__ = [
    "BucketedGraph",
    "multi_source_shortest_paths_ell",
    "fit_kmeans",
    "nearest_codes",
    "geo_compat",
    "knn_search",
    "knn_search_ivf",
    "build_knn_graph",
    "build_knn_graph_auto",
    "largest_connected_component",
    "symmetric_csr_from_edges",
    "analyze_graph_connectivity",
    "multi_source_shortest_paths",
    "single_source_shortest_paths",
    "distances_between",
    "connected_components_device",
    "fit_kmedoids",
    "kpp_initialization",
    "kpp_parallel_initialization",
    "assign_points_to_medoids",
    "compute_quantization_error",
    "build_mlp_decode_fn",
    "edge_lengths_riemannian",
    "edge_lengths_riemannian_auto",
    "edge_lengths_riemannian_indexed",
    "edge_lengths_riemannian_nodal",
]
