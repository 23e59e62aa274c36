"""Evaluation: CD/EMD pairwise metrics, MMD/COV/1-NNA, JSD, orchestration."""
from .metrics import (compute_all_metrics, emd_cd_paired,
                      jsd_between_point_cloud_sets, knn_accuracy,
                      lgan_mmd_cov, pairwise_cd, pairwise_emd)
from .eval_helper import (compute_nll_metric, compute_score, get_cats,
                          get_ref_num, get_ref_pt, normalize_point_clouds,
                          print_results, write_results)

__all__ = [
    "compute_all_metrics", "emd_cd_paired", "jsd_between_point_cloud_sets",
    "knn_accuracy", "lgan_mmd_cov", "pairwise_cd", "pairwise_emd",
    "compute_nll_metric", "compute_score", "get_cats", "get_ref_num",
    "get_ref_pt", "normalize_point_clouds", "print_results", "write_results",
]
