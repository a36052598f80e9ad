from grafp_tpu.ops.knn import knn_graph, pairwise_sqdist, dilate_neighbors
