"""Distributed analytics kernels reproducing the reference's
classification stage (PCA + KMeans over the user feature matrix,
`[U: upstream analysis tasks]`, SURVEY.md §2 A10/A11) — numpy + Spark
only, no sklearn in this environment (SURVEY.md Appendix A)."""

from .kmeans import kmeans_fit, kmeans_assign_df
from .pca import pca_fit, pca_project_df

__all__ = ["kmeans_fit", "kmeans_assign_df", "pca_fit", "pca_project_df"]
