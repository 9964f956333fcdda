"""MeanShift clustering wrapper (reference perception/utils/
clustering_utils.py:5-17). Kept for API parity; the jit-able alternative the
pipeline actually uses is ops.associate.masked_kmeans."""

from sklearn import cluster


class KeypointClustering:
    def __init__(self, bandwidth):
        self.clustering = cluster.MeanShift(
            bandwidth=bandwidth, cluster_all=True, bin_seeding=True, min_bin_freq=1
        )
        self.past_clusters = None

    def __call__(self, indices):
        """indices: N x D array -> (cluster centers C x D, labels N)."""
        self.clustering.fit(indices)
        return self.clustering.cluster_centers_, self.clustering.labels_
