"""Top-N result gathering across queries (parity: utils/sort.py:9-45)."""
from __future__ import annotations

from collections import defaultdict
from typing import Any, Dict, List, Optional

import numpy as np
import pandas as pd


class SetOfResults:
    """Gather top-N rows per query into a ranked dataframe."""

    def __init__(self, df: pd.DataFrame, searchable=False):
        from searcharray_tpu.pandas_ext.array import SearchArray

        self.df = df
        self.metadata: Dict[str, List[Any]] = defaultdict(list)
        self.indices: List[int] = []
        self.searchable_cols: List[str] = []
        for col in df.columns:
            if not searchable and isinstance(df[col].array, SearchArray):
                self.searchable_cols.append(col)

    def ins_top_n(self, scores, N=10, query: str = "",
                  metadata: Optional[Dict[str, List[Any]]] = None):
        scores = np.asarray(scores)
        top_n = np.argpartition(scores, -N)[-N:]
        self.indices.extend(top_n)
        self.metadata["score"].extend(scores[top_n])
        self.metadata["query"].extend([query] * len(top_n))
        if metadata is None:
            return
        for key, values in metadata.items():
            if not isinstance(values, list):
                values = [values] * len(top_n)
            self.metadata[key].extend(values)
            if len(self.metadata[key]) != len(self.indices):
                raise ValueError("Metadata must have same length as scores.")

    def get_all(self) -> pd.DataFrame:
        subset = self.df.iloc[
            self.indices, ~self.df.columns.isin(self.searchable_cols)
        ]
        for key, values in self.metadata.items():
            subset[key] = values
        sorted_subset = subset.sort_values(["query", "score"],
                                           ascending=[True, False])
        sorted_subset["rank"] = sorted_subset.groupby("query").cumcount() + 1
        return sorted_subset.reset_index(drop=True)
