"""Precision-Recall for Distributions (PRD), Sajjadi et al. 2018
(arXiv:1806.00035).

Independent implementation of the algorithm used by the reference
(precision_recall_distributions/prd_score.py): PRD curve over an equiangular
slope grid, minibatch k-means binning of embeddings, and the (F_8, F_1/8)
summary pair.  API-compatible with the reference module so eval code and its
unit-test suite carry over.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def compute_prd(eval_dist, ref_dist, num_angles: int = 1001,
                epsilon: float = 1e-10):
    """PRD curve of a discrete eval distribution vs a reference.

    For each slope lambda = tan(theta): precision(lambda) =
    sum_i min(lambda * ref_i, eval_i), recall = precision / lambda.
    """
    if not 0 < epsilon <= 0.1:
        raise ValueError(f'epsilon must be in (0, 0.1] but is {epsilon}.')
    if not 3 <= num_angles <= 1e6:
        raise ValueError(
            f'num_angles must be in [3, 1e6] but is {num_angles}.')
    eval_dist = np.asarray(eval_dist, np.float64)
    ref_dist = np.asarray(ref_dist, np.float64)

    angles = np.linspace(epsilon, np.pi / 2 - epsilon, num=num_angles)
    slopes = np.tan(angles)
    precision = np.minimum(ref_dist[None, :] * slopes[:, None],
                           eval_dist[None, :]).sum(axis=1)
    recall = precision / slopes
    if max(precision.max(), recall.max()) > 1.001:
        raise ValueError('Detected value > 1.001, this should not happen.')
    return np.clip(precision, 0, 1), np.clip(recall, 0, 1)


def _cluster_into_bins(eval_data, ref_data, num_clusters: int):
    """Minibatch k-means over the union; per-cluster densities."""
    import sklearn.cluster
    data = np.vstack([eval_data, ref_data])
    kmeans = sklearn.cluster.MiniBatchKMeans(n_clusters=num_clusters,
                                             n_init=10)
    labels = kmeans.fit(data).labels_
    eval_labels = labels[:len(eval_data)]
    ref_labels = labels[len(eval_data):]
    eval_bins = np.histogram(eval_labels, bins=num_clusters,
                             range=[0, num_clusters], density=True)[0]
    ref_bins = np.histogram(ref_labels, bins=num_clusters,
                            range=[0, num_clusters], density=True)[0]
    return eval_bins, ref_bins


def compute_prd_from_embedding(eval_data, ref_data, num_clusters: int = 20,
                               num_angles: int = 1001, num_runs: int = 10,
                               enforce_balance: bool = True):
    """Average PRD curve over num_runs k-means clusterings."""
    eval_data = np.asarray(eval_data, np.float64)
    ref_data = np.asarray(ref_data, np.float64)
    if enforce_balance and len(eval_data) != len(ref_data):
        raise ValueError(
            'The number of points in eval_data %d should be equal to the '
            'number of points in ref_data %d. To disable this behavior, '
            'set enforce_balance to False (not recommended).'
            % (len(eval_data), len(ref_data)))

    precisions, recalls = [], []
    for _ in range(num_runs):
        eval_dist, ref_dist = _cluster_into_bins(eval_data, ref_data,
                                                 num_clusters)
        p, r = compute_prd(eval_dist, ref_dist, num_angles)
        precisions.append(p)
        recalls.append(r)
    return (np.mean(precisions, axis=0), np.mean(recalls, axis=0))


def _f_beta(precision, recall, beta):
    b2 = beta ** 2
    denom = b2 * precision + recall
    return np.where(denom > 0,
                    (1 + b2) * precision * recall / np.maximum(denom, 1e-30),
                    0.0)


def prd_to_max_f_beta_pair(precision, recall, beta: float = 8):
    """(max F_beta, max F_{1/beta}) summary of a PRD curve."""
    precision = np.asarray(precision)
    recall = np.asarray(recall)
    if not ((precision >= 0).all() and (precision <= 1).all()):
        raise ValueError('All values in precision must be in [0, 1].')
    if not ((recall >= 0).all() and (recall <= 1).all()):
        raise ValueError('All values in recall must be in [0, 1].')
    if beta <= 0:
        raise ValueError(f'Given parameter beta {beta} must be positive.')
    return (float(np.max(_f_beta(precision, recall, beta))),
            float(np.max(_f_beta(precision, recall, 1.0 / beta))))


def plot(precision_recall_pairs, labels=None, out_path=None,
         legend_loc='lower left', dpi=300):
    """PRD curve plot (reference prd_score.py:277-327)."""
    if labels is not None and len(labels) != len(precision_recall_pairs):
        raise ValueError(
            'Length of labels %d must be identical to length of '
            'precision_recall_pairs %d.'
            % (len(labels), len(precision_recall_pairs)))
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(3.5, 3.5), dpi=dpi)
    plot_handle = fig.add_subplot(111)
    plot_handle.tick_params(axis='both', which='major', labelsize=12)
    for i, (precision, recall) in enumerate(precision_recall_pairs):
        label = labels[i] if labels is not None else None
        plt.plot(recall, precision, label=label, alpha=0.5, linewidth=3)
    if labels is not None:
        plt.legend(loc=legend_loc)
    plt.xlim([0, 1])
    plt.ylim([0, 1])
    plt.xlabel('Recall', fontsize=12)
    plt.ylabel('Precision', fontsize=12)
    plt.tight_layout()
    if out_path is None:
        return fig
    plt.savefig(out_path, bbox_inches='tight', dpi=dpi)
    plt.close()
    return None
