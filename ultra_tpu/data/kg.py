"""KG dataset zoo: the 57 link-prediction datasets of the reference
(/root/reference/ultra/datasets.py), reimplemented framework-free (numpy +
stdlib) with npz caching, producing static-shape device Graphs.

Canonical record per split (datasets.py:318-334): message graph
``edge_index (2, E)`` / ``edge_type (E)`` **with explicit inverse edges**
(type + num_rel), ``num_nodes``, ``num_relations`` (2x raw), supervision
``target_edge_index/type`` (no inverses), and an attached relation graph.

Families and their quirks (all mirrored here, citations inline):
  - TransductiveDataset: 3 files, vocab accumulated train->valid->test
    (datasets.py:288-334); CoDEx/Hetionet/AristoV4(zip)/ConceptNet100k/
    DBpedia100k/YAGO310; NELL995 merges facts+train (datasets.py:431-471)
  - SparserKG: (h, t, r) column order (datasets.py:555-582), tail-only eval
  - InductiveDataset (e): 4 files, separate inference vocab, valid_on_inf
    switch (datasets.py:600-719); Ingram (e,r); ILPC2022; HM custom
    num_nodes fix (datasets.py:802-850)
  - GrailInductiveDataset: merged valid+test inference split by default
    (datasets.py:11-139)
  - MTDEAInductive: limit_vocab triple dropping (datasets.py:895-930)
  - JointDataset: pretraining mixture (datasets.py:1051-1095)

Downloads use urllib and fail with a clear message in offline environments;
pre-populated ``<root>/<name>/raw`` directories are picked up as-is.
"""

from __future__ import annotations

import os
import shutil
import urllib.request
import zipfile
from typing import Dict, List, NamedTuple, Optional, Sequence, Tuple

import numpy as np


class KGSplit(NamedTuple):
    edge_index: np.ndarray  # (2, E) message graph WITH inverses
    edge_type: np.ndarray  # (E,)
    num_nodes: int
    num_relations: int  # including inverses (2x raw)
    target_edge_index: np.ndarray  # (2, T) supervision edges, no inverses
    target_edge_type: np.ndarray  # (T,)


class KGDataset(NamedTuple):
    name: str
    train: KGSplit
    valid: KGSplit
    test: KGSplit

    def __getitem__(self, i):
        return (self.train, self.valid, self.test)[i]


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def download(url: str, path: str):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    try:
        print(f"downloading {url} -> {path}")
        urllib.request.urlretrieve(url, path)
    except Exception as exc:  # noqa: BLE001
        raise RuntimeError(
            f"Could not download {url} ({exc}). This environment may have no "
            f"network access — place the file at {path} manually."
        ) from exc


def load_file(
    path: str,
    inv_entity_vocab: dict,
    inv_rel_vocab: dict,
    delimiter: Optional[str] = None,
    col_order: str = "hrt",  # 'hrt' standard | 'htr' SparserKG dumps
    limit_vocab: bool = False,  # MTDEA fix: drop triples with unseen tokens
    require_known_rel: bool = False,  # Grail test files assert known relations
):
    """Vocab-accumulating triple reader; returns (u, v, r) int triples in
    file order, exactly like the reference load_file (datasets.py:258-285)."""
    triplets = []
    with open(path, "r", encoding="utf-8") as fin:
        for line in fin:
            parts = line.split() if delimiter is None else line.strip().split(delimiter)
            if not parts:
                continue
            if col_order == "hrt":
                u, r, v = parts
            else:
                u, v, r = parts
            if limit_vocab and (
                u not in inv_entity_vocab or v not in inv_entity_vocab or r not in inv_rel_vocab
            ):
                continue
            if u not in inv_entity_vocab:
                inv_entity_vocab[u] = len(inv_entity_vocab)
            if v not in inv_entity_vocab:
                inv_entity_vocab[v] = len(inv_entity_vocab)
            if r not in inv_rel_vocab:
                if require_known_rel:
                    raise AssertionError(f"unknown relation {r!r} in {path}")
                inv_rel_vocab[r] = len(inv_rel_vocab)
            triplets.append((inv_entity_vocab[u], inv_entity_vocab[v], inv_rel_vocab[r]))
    return {
        "triplets": triplets,
        "num_node": len(inv_entity_vocab),
        "num_relation": len(inv_rel_vocab),
        "inv_entity_vocab": inv_entity_vocab,
        "inv_rel_vocab": inv_rel_vocab,
    }


def _edges(triplets: Sequence[Tuple[int, int, int]]):
    if len(triplets) == 0:
        return np.zeros((2, 0), np.int64), np.zeros(0, np.int64)
    arr = np.asarray(triplets, dtype=np.int64)
    return arr[:, :2].T.copy(), arr[:, 2].copy()


def with_inverses(edge_index, edge_type, num_raw_relations):
    """Append (t, h, r + R) inverse edges (datasets.py:318-319)."""
    ei = np.concatenate([edge_index, edge_index[::-1]], axis=1)
    et = np.concatenate([edge_type, edge_type + num_raw_relations])
    return ei, et


# ---------------------------------------------------------------------------
# caching
# ---------------------------------------------------------------------------


def _save_dataset(path: str, ds: KGDataset):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    payload = {"name": np.asarray(ds.name)}
    for split_name, split in zip(("train", "valid", "test"), (ds.train, ds.valid, ds.test)):
        payload[f"{split_name}_edge_index"] = split.edge_index
        payload[f"{split_name}_edge_type"] = split.edge_type
        payload[f"{split_name}_num_nodes"] = np.asarray(split.num_nodes)
        payload[f"{split_name}_num_relations"] = np.asarray(split.num_relations)
        payload[f"{split_name}_target_edge_index"] = split.target_edge_index
        payload[f"{split_name}_target_edge_type"] = split.target_edge_type
    np.savez_compressed(path, **payload)


def _load_dataset(path: str) -> KGDataset:
    z = np.load(path, allow_pickle=False)
    splits = []
    for s in ("train", "valid", "test"):
        splits.append(
            KGSplit(
                edge_index=z[f"{s}_edge_index"],
                edge_type=z[f"{s}_edge_type"],
                num_nodes=int(z[f"{s}_num_nodes"]),
                num_relations=int(z[f"{s}_num_relations"]),
                target_edge_index=z[f"{s}_target_edge_index"],
                target_edge_type=z[f"{s}_target_edge_type"],
            )
        )
    return KGDataset(str(z["name"]), *splits)


# ---------------------------------------------------------------------------
# transductive family
# ---------------------------------------------------------------------------


class TransductiveDataset:
    """3 splits sharing the train message graph (datasets.py:240-353)."""

    name: str = ""
    urls: Sequence[str] = ()
    delimiter: Optional[str] = None
    col_order: str = "hrt"
    raw_file_names = ("train.txt", "valid.txt", "test.txt")

    def __init__(self, root: str, **kwargs):
        self.root = os.path.expanduser(root)
        for k, v in kwargs.items():
            setattr(self, k, v)

    @property
    def raw_dir(self):
        return os.path.join(self.root, self.name, "raw")

    @property
    def processed_path(self):
        return os.path.join(self.root, self.name, "processed_tpu", "data.npz")

    def raw_paths(self):
        return [os.path.join(self.raw_dir, f) for f in self.raw_file_names]

    def download(self):
        for url, path in zip(self.urls, self.raw_paths()):
            if not os.path.exists(path):
                download(url, path)

    def load(self) -> KGDataset:
        if os.path.exists(self.processed_path):
            return _load_dataset(self.processed_path)
        if not all(os.path.exists(p) for p in self.raw_paths()):
            self.download()
        ds = self.process()
        _save_dataset(self.processed_path, ds)
        return ds

    def _load_split_files(self):
        paths = self.raw_paths()
        train = load_file(paths[0], {}, {}, self.delimiter, self.col_order)
        valid = load_file(
            paths[1], train["inv_entity_vocab"], train["inv_rel_vocab"],
            self.delimiter, self.col_order,
        )
        test = load_file(
            paths[2], train["inv_entity_vocab"], train["inv_rel_vocab"],
            self.delimiter, self.col_order,
        )
        return train, valid, test

    def process(self) -> KGDataset:
        train, valid, test = self._load_split_files()
        # vocab accumulated across splits; test holds the final counts
        # (datasets.py:298-303: YAGO/Aristo grow vocab in valid/test)
        num_node = test["num_node"]
        num_rel = test["num_relation"]
        if num_rel > max(num_node, 4096):
            # almost certainly a mis-parsed file (wrong col_order /
            # delimiter): every entity token in the relation column mints
            # a relation, and the relation graph then explodes toward its
            # 4*R^2 bound (a real instance: swapped columns produced
            # R=13924, a 212M-edge relation graph, and an hour of plan
            # build at 60 GB host RSS before anything failed visibly)
            import logging

            logging.getLogger("ultra_tpu").warning(
                "dataset %r parsed %d relation types > %d entities — "
                "check col_order (%r) and delimiter (%r); proceeding, but "
                "the relation graph may be enormous",
                self.name, num_rel, num_node, self.col_order, self.delimiter,
            )

        tr_ei, tr_et = _edges(train["triplets"])
        va_ei, va_et = _edges(valid["triplets"])
        te_ei, te_et = _edges(test["triplets"])
        msg_ei, msg_et = with_inverses(tr_ei, tr_et, num_rel)

        def split(target_ei, target_et):
            return KGSplit(msg_ei, msg_et, num_node, num_rel * 2, target_ei, target_et)

        return KGDataset(
            self.name, split(tr_ei, tr_et), split(va_ei, va_et), split(te_ei, te_et)
        )


class FB15k237(TransductiveDataset):
    """Reference wraps PyG's RelLinkPredDataset (datasets.py:186-205);
    here the same MichSchli/RelationPrediction raw dumps are read directly
    (tab-separated h r t + entity/relation dicts are not needed since we
    build vocabs from the triples in the same accumulation order)."""

    name = "fb15k237"
    urls = [
        "https://raw.githubusercontent.com/MichSchli/RelationPrediction/master/data/FB-Toutanova/train.txt",
        "https://raw.githubusercontent.com/MichSchli/RelationPrediction/master/data/FB-Toutanova/valid.txt",
        "https://raw.githubusercontent.com/MichSchli/RelationPrediction/master/data/FB-Toutanova/test.txt",
    ]


class WN18RR(TransductiveDataset):
    """Reference wraps PyG WordNet18RR (datasets.py:207-237); direct read of
    the villmow/datasets_knowledge_embedding dumps."""

    name = "wn18rr"
    urls = [
        "https://raw.githubusercontent.com/villmow/datasets_knowledge_embedding/master/WN18RR/original/train.txt",
        "https://raw.githubusercontent.com/villmow/datasets_knowledge_embedding/master/WN18RR/original/valid.txt",
        "https://raw.githubusercontent.com/villmow/datasets_knowledge_embedding/master/WN18RR/original/test.txt",
    ]


class CoDEx(TransductiveDataset):
    size = ""

    @property
    def urls(self):
        return [
            f"https://raw.githubusercontent.com/tsafavi/codex/master/data/triples/{self.name}/{f}"
            for f in ("train.txt", "valid.txt", "test.txt")
        ]


class CoDExSmall(CoDEx):
    name = "codex-s"


class CoDExMedium(CoDEx):
    name = "codex-m"


class CoDExLarge(CoDEx):
    name = "codex-l"


class NELL995(TransductiveDataset):
    """facts + train files merged into the training graph
    (datasets.py:412-471)."""

    name = "nell995"
    urls = [
        "https://raw.githubusercontent.com/LARS-research/RED-GNN/main/transductive/data/nell/facts.txt",
        "https://raw.githubusercontent.com/LARS-research/RED-GNN/main/transductive/data/nell/train.txt",
        "https://raw.githubusercontent.com/LARS-research/RED-GNN/main/transductive/data/nell/valid.txt",
        "https://raw.githubusercontent.com/LARS-research/RED-GNN/main/transductive/data/nell/test.txt",
    ]
    raw_file_names = ("facts.txt", "train.txt", "valid.txt", "test.txt")

    def process(self) -> KGDataset:
        paths = self.raw_paths()
        facts = load_file(paths[0], {}, {}, self.delimiter, self.col_order)
        train = load_file(paths[1], facts["inv_entity_vocab"], facts["inv_rel_vocab"], self.delimiter)
        valid = load_file(paths[2], train["inv_entity_vocab"], train["inv_rel_vocab"], self.delimiter)
        test = load_file(paths[3], train["inv_entity_vocab"], train["inv_rel_vocab"], self.delimiter)

        num_node = valid["num_node"]  # datasets.py:439
        num_rel = train["num_relation"]
        tr_ei, tr_et = _edges(facts["triplets"] + train["triplets"])
        va_ei, va_et = _edges(valid["triplets"])
        te_ei, te_et = _edges(test["triplets"])
        msg_ei, msg_et = with_inverses(tr_ei, tr_et, num_rel)

        def split(tei, tet):
            return KGSplit(msg_ei, msg_et, num_node, num_rel * 2, tei, tet)

        return KGDataset(self.name, split(tr_ei, tr_et), split(va_ei, va_et), split(te_ei, te_et))


class ConceptNet100k(TransductiveDataset):
    name = "cnet100k"
    delimiter = "\t"
    urls = [
        "https://raw.githubusercontent.com/guojiapub/BiQUE/master/src_data/conceptnet-100k/train",
        "https://raw.githubusercontent.com/guojiapub/BiQUE/master/src_data/conceptnet-100k/valid",
        "https://raw.githubusercontent.com/guojiapub/BiQUE/master/src_data/conceptnet-100k/test",
    ]


class DBpedia100k(TransductiveDataset):
    name = "dbp100k"
    urls = [
        "https://raw.githubusercontent.com/iieir-km/ComplEx-NNE_AER/master/datasets/DB100K/_train.txt",
        "https://raw.githubusercontent.com/iieir-km/ComplEx-NNE_AER/master/datasets/DB100K/_valid.txt",
        "https://raw.githubusercontent.com/iieir-km/ComplEx-NNE_AER/master/datasets/DB100K/_test.txt",
    ]


class YAGO310(TransductiveDataset):
    name = "yago310"
    urls = [
        "https://raw.githubusercontent.com/DeepGraphLearning/KnowledgeGraphEmbedding/master/data/YAGO3-10/train.txt",
        "https://raw.githubusercontent.com/DeepGraphLearning/KnowledgeGraphEmbedding/master/data/YAGO3-10/valid.txt",
        "https://raw.githubusercontent.com/DeepGraphLearning/KnowledgeGraphEmbedding/master/data/YAGO3-10/test.txt",
    ]


class Hetionet(TransductiveDataset):
    name = "hetionet"
    urls = [
        "https://www.dropbox.com/s/y47bt9oq57h6l5k/train.txt?dl=1",
        "https://www.dropbox.com/s/a0pbrx9tz3dgsff/valid.txt?dl=1",
        "https://www.dropbox.com/s/4dhrvg3fyq5tnu4/test.txt?dl=1",
    ]


class AristoV4(TransductiveDataset):
    name = "aristov4"
    delimiter = "\t"
    url = "https://zenodo.org/record/5942560/files/aristo-v4.zip"

    def download(self):
        zip_path = os.path.join(self.raw_dir, "aristo-v4.zip")
        download(self.url, zip_path)
        with zipfile.ZipFile(zip_path) as zf:
            zf.extractall(self.raw_dir)
        os.unlink(zip_path)
        for old, new in zip(["train", "valid", "test"], self.raw_paths()):
            os.rename(os.path.join(self.raw_dir, old), new)


class SparserKG(TransductiveDataset):
    """DacKGR sparse KGs; dumps are (h, t, r) ordered (datasets.py:529-582).
    Tail-only metrics apply at eval time (run.py:133,191-199)."""

    url = "https://raw.githubusercontent.com/THU-KEG/DacKGR/master/data.zip"
    delimiter = "\t"
    col_order = "htr"
    base_name = "SparseKG"
    tail_only_eval = True

    @property
    def raw_dir(self):
        return os.path.join(self.root, self.base_name, self.name, "raw")

    @property
    def processed_path(self):
        return os.path.join(self.root, self.base_name, self.name, "processed_tpu", "data.npz")

    def download(self):
        base = os.path.join(self.root, self.base_name)
        zip_path = os.path.join(base, "data.zip")
        download(self.url, zip_path)
        with zipfile.ZipFile(zip_path) as zf:
            zf.extractall(base)
        for dsname in ["NELL23K", "WD-singer", "FB15K-237-10", "FB15K-237-20", "FB15K-237-50"]:
            for old, new in zip(["train.triples", "dev.triples", "test.triples"], self.raw_file_names):
                src = os.path.join(base, "data", dsname, old)
                dst = os.path.join(base, dsname, "raw", new)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                shutil.move(src, dst)
        shutil.rmtree(os.path.join(base, "data"))
        os.unlink(zip_path)


class WDsinger(SparserKG):
    name = "WD-singer"


class NELL23k(SparserKG):
    name = "NELL23K"


class FB15k237_10(SparserKG):
    name = "FB15K-237-10"


class FB15k237_20(SparserKG):
    name = "FB15K-237-20"


class FB15k237_50(SparserKG):
    name = "FB15K-237-50"


# ---------------------------------------------------------------------------
# inductive families
# ---------------------------------------------------------------------------


class InductiveDataset:
    """4 files: transductive_train / inference_graph / valid / test
    (datasets.py:600-719). ``valid_on_inf`` picks whether validation lives on
    the inference graph (default) or the training graph (HM/MTDEA)."""

    name: str = ""
    urls: Sequence[str] = ()
    delimiter: Optional[str] = None
    valid_on_inf = True
    raw_file_names = (
        "transductive_train.txt", "inference_graph.txt", "inf_valid.txt", "inf_test.txt",
    )

    def __init__(self, root: str, version, **kwargs):
        self.root = os.path.expanduser(root)
        self.version = str(version)
        for k, v in kwargs.items():
            setattr(self, k, v)

    @property
    def raw_dir(self):
        return os.path.join(self.root, self.name, self.version, "raw")

    @property
    def processed_path(self):
        return os.path.join(self.root, self.name, self.version, "processed_tpu", "data.npz")

    def raw_paths(self):
        return [os.path.join(self.raw_dir, f) for f in self.raw_file_names]

    def download(self):
        for url, path in zip(self.urls, self.raw_paths()):
            if not os.path.exists(path):
                download(url % self.version, path)

    def load(self) -> KGDataset:
        if os.path.exists(self.processed_path):
            return _load_dataset(self.processed_path)
        if not all(os.path.exists(p) for p in self.raw_paths()):
            self.download()
        ds = self.process()
        _save_dataset(self.processed_path, ds)
        return ds

    def _read(self):
        paths = self.raw_paths()
        train = load_file(paths[0], {}, {}, self.delimiter)
        inference = load_file(paths[1], {}, {}, self.delimiter)
        base = inference if self.valid_on_inf else train
        valid = load_file(
            paths[2], base["inv_entity_vocab"], base["inv_rel_vocab"], self.delimiter
        )
        test = load_file(
            paths[3], inference["inv_entity_vocab"], inference["inv_rel_vocab"], self.delimiter
        )
        return train, inference, valid, test

    def process(self) -> KGDataset:
        train, inference, valid, test = self._read()
        num_train_nodes, num_train_rels = train["num_node"], train["num_relation"]
        inf_nodes, inf_rels = test["num_node"], test["num_relation"]

        tr_ei, tr_et = _edges(train["triplets"])
        msg_tr_ei, msg_tr_et = with_inverses(tr_ei, tr_et, num_train_rels)
        inf_ei, inf_et = _edges(inference["triplets"])
        msg_inf_ei, msg_inf_et = with_inverses(inf_ei, inf_et, inf_rels)
        va_ei, va_et = _edges(valid["triplets"])
        te_ei, te_et = _edges(test["triplets"])

        train_split = KGSplit(
            msg_tr_ei, msg_tr_et, num_train_nodes, num_train_rels * 2, tr_ei, tr_et
        )
        if self.valid_on_inf:
            valid_split = KGSplit(
                msg_inf_ei, msg_inf_et, inf_nodes, inf_rels * 2, va_ei, va_et
            )
        else:
            valid_split = KGSplit(
                msg_tr_ei, msg_tr_et, self._valid_num_nodes(train, valid),
                num_train_rels * 2, va_ei, va_et,
            )
        test_split = KGSplit(msg_inf_ei, msg_inf_et, inf_nodes, inf_rels * 2, te_ei, te_et)
        return KGDataset(f"{self.name}-{self.version}", train_split, valid_split, test_split)

    def _valid_num_nodes(self, train, valid):
        # plain InductiveDataset uses the train graph node count when
        # valid_on_inf=False; HM/MTDEA override with valid vocab size
        return train["num_node"]


class IngramInductive(InductiveDataset):
    @property
    def raw_dir(self):
        return os.path.join(self.root, "ingram", self.name, self.version, "raw")

    @property
    def processed_path(self):
        return os.path.join(self.root, "ingram", self.name, self.version, "processed_tpu", "data.npz")


def _ingram_urls(prefix):
    return [
        f"https://raw.githubusercontent.com/bdi-lab/InGram/master/data/{prefix}-%s/{f}"
        for f in ("train.txt", "msg.txt", "valid.txt", "test.txt")
    ]


class FBIngram(IngramInductive):
    name = "fb"
    urls = _ingram_urls("FB")


class WKIngram(IngramInductive):
    name = "wk"
    urls = _ingram_urls("WK")


class NLIngram(IngramInductive):
    name = "nl"
    urls = _ingram_urls("NL")


class ILPC2022(InductiveDataset):
    name = "ilpc2022"
    urls = [
        "https://raw.githubusercontent.com/pykeen/ilpc2022/master/data/%s/train.txt",
        "https://raw.githubusercontent.com/pykeen/ilpc2022/master/data/%s/inference.txt",
        "https://raw.githubusercontent.com/pykeen/ilpc2022/master/data/%s/inference_validation.txt",
        "https://raw.githubusercontent.com/pykeen/ilpc2022/master/data/%s/inference_test.txt",
    ]


class HM(InductiveDataset):
    """Hamaguchi/INDIGO benchmarks; validation on the train graph with a few
    hundred new nodes -> num_nodes from the valid vocab (datasets.py:836-838)."""

    name = "hm"
    valid_on_inf = False
    urls = [
        "https://raw.githubusercontent.com/shuwen-liu-ox/INDIGO/master/data/%s/train/train.txt",
        "https://raw.githubusercontent.com/shuwen-liu-ox/INDIGO/master/data/%s/test/test-graph.txt",
        "https://raw.githubusercontent.com/shuwen-liu-ox/INDIGO/master/data/%s/train/valid.txt",
        "https://raw.githubusercontent.com/shuwen-liu-ox/INDIGO/master/data/%s/test/test-fact.txt",
    ]
    versions = {
        "1k": "Hamaguchi-BM_both-1000",
        "3k": "Hamaguchi-BM_both-3000",
        "5k": "Hamaguchi-BM_both-5000",
        "indigo": "INDIGO-BM",
    }

    def __init__(self, root, version, **kwargs):
        super().__init__(root, self.versions[str(version)], **kwargs)

    def _valid_num_nodes(self, train, valid):
        return valid["num_node"]


class GrailInductiveDataset:
    """GraIL splits: separate train/test vocabs, shared relation vocab;
    merged valid+test inference edges as the test split by default
    (datasets.py:11-139)."""

    name: str = ""
    urls: Sequence[str] = ()
    merge_valid_test = True
    raw_file_names = ("train_ind.txt", "valid_ind.txt", "test_ind.txt", "train.txt", "valid.txt")

    def __init__(self, root, version, merge_valid_test=True, **kwargs):
        assert version in ("v1", "v2", "v3", "v4")
        self.root = os.path.expanduser(root)
        self.version = version
        self.merge_valid_test = merge_valid_test

    @property
    def raw_dir(self):
        return os.path.join(self.root, "grail", self.name, self.version, "raw")

    @property
    def processed_path(self):
        return os.path.join(self.root, "grail", self.name, self.version, "processed_tpu", "data.npz")

    def raw_paths(self):
        return [os.path.join(self.raw_dir, f) for f in self.raw_file_names]

    def download(self):
        for url, path in zip(self.urls, self.raw_paths()):
            if not os.path.exists(path):
                download(url % self.version, path)

    def load(self) -> KGDataset:
        if os.path.exists(self.processed_path):
            return _load_dataset(self.processed_path)
        if not all(os.path.exists(p) for p in self.raw_paths()):
            self.download()
        ds = self.process()
        _save_dataset(self.processed_path, ds)
        return ds

    def process(self) -> KGDataset:
        paths = self.raw_paths()
        test_files = paths[:3]  # train_ind, valid_ind, test_ind
        train_files = paths[3:]  # train, valid

        inv_train, inv_test, inv_rel = {}, {}, {}
        chunks = []
        # transductive files first (build the relation vocab), then inductive
        for p in train_files:
            res = load_file(p, inv_train, inv_rel, delimiter="\t")
            chunks.append(res["triplets"])
        for p in test_files:
            res = load_file(p, inv_test, inv_rel, delimiter="\t", require_known_rel=True)
            chunks.append(res["triplets"])
        # order in the reference: train, valid, train_ind, valid_ind, test_ind
        train_t, valid_t, train_ind_t, valid_ind_t, test_ind_t = chunks
        num_rel = len(inv_rel)

        tr_ei, tr_et = _edges(train_t)
        msg_tr_ei, msg_tr_et = with_inverses(tr_ei, tr_et, num_rel)
        ti_ei, ti_et = _edges(train_ind_t)
        msg_ti_ei, msg_ti_et = with_inverses(ti_ei, ti_et, num_rel)
        va_ei, va_et = _edges(valid_t)
        if self.merge_valid_test:
            test_targets = valid_ind_t + test_ind_t
        else:
            test_targets = test_ind_t
        te_ei, te_et = _edges(test_targets)

        train_split = KGSplit(msg_tr_ei, msg_tr_et, len(inv_train), num_rel * 2, tr_ei, tr_et)
        valid_split = KGSplit(msg_tr_ei, msg_tr_et, len(inv_train), num_rel * 2, va_ei, va_et)
        test_split = KGSplit(msg_ti_ei, msg_ti_et, len(inv_test), num_rel * 2, te_ei, te_et)
        return KGDataset(f"{self.name}-{self.version}", train_split, valid_split, test_split)


def _grail_urls(prefix):
    return [
        f"https://raw.githubusercontent.com/kkteru/grail/master/data/{prefix}_%s_ind/train.txt",
        f"https://raw.githubusercontent.com/kkteru/grail/master/data/{prefix}_%s_ind/valid.txt",
        f"https://raw.githubusercontent.com/kkteru/grail/master/data/{prefix}_%s_ind/test.txt",
        f"https://raw.githubusercontent.com/kkteru/grail/master/data/{prefix}_%s/train.txt",
        f"https://raw.githubusercontent.com/kkteru/grail/master/data/{prefix}_%s/valid.txt",
    ]


class FB15k237Inductive(GrailInductiveDataset):
    name = "IndFB15k237"
    urls = _grail_urls("fb237")


class WN18RRInductive(GrailInductiveDataset):
    name = "IndWN18RR"
    urls = _grail_urls("WN18RR")


class NELLInductive(GrailInductiveDataset):
    name = "IndNELL"
    urls = _grail_urls("nell")


class MTDEAInductive(InductiveDataset):
    """MTDEA datasets: valid split drops triples with unseen vocab
    (limit_vocab, datasets.py:895-944); num_nodes of valid = valid vocab."""

    valid_on_inf = False
    url = "https://reltrans.s3.us-east-2.amazonaws.com/MTDEA_data.zip"
    base_name = "mtdea"
    prefix = "%s"
    versions: Sequence[str] = ()
    raw_file_names = (
        "transductive_train.txt", "inference_graph.txt", "transductive_valid.txt", "inf_test.txt",
    )

    def __init__(self, root, version, **kwargs):
        assert version in self.versions, f"unknown version {version}, available: {self.versions}"
        super().__init__(root, version, **kwargs)

    @property
    def raw_dir(self):
        return os.path.join(self.root, self.base_name, self.name, self.version, "raw")

    @property
    def processed_path(self):
        return os.path.join(
            self.root, self.base_name, self.name, self.version, "processed_tpu", "data.npz"
        )

    def download(self):
        base = os.path.join(self.root, self.base_name)
        zip_path = os.path.join(base, "MTDEA_data.zip")
        download(self.url, zip_path)
        with zipfile.ZipFile(zip_path) as zf:
            zf.extractall(base)
        for cls in (FBNELL, Metafam, WikiTopicsMT1, WikiTopicsMT2, WikiTopicsMT3, WikiTopicsMT4):
            for version in cls.versions:
                for old, new in zip(
                    ["train.txt", "observe.txt", "valid.txt", "test.txt"], self.raw_file_names
                ):
                    folder = cls.prefix % version + ("-trans" if "transductive" in new else "-ind")
                    src = os.path.join(base, "MTDEA_datasets", cls.name, folder, old)
                    dst = os.path.join(base, cls.name, version, "raw", new)
                    os.makedirs(os.path.dirname(dst), exist_ok=True)
                    shutil.move(src, dst)
        shutil.rmtree(os.path.join(base, "MTDEA_datasets"))
        os.unlink(zip_path)

    def _read(self):
        paths = self.raw_paths()
        train = load_file(paths[0], {}, {}, self.delimiter)
        inference = load_file(paths[1], {}, {}, self.delimiter)
        base = inference if self.valid_on_inf else train
        valid = load_file(
            paths[2], base["inv_entity_vocab"], base["inv_rel_vocab"], self.delimiter,
            limit_vocab=True,  # datasets.py:943
        )
        test = load_file(
            paths[3], inference["inv_entity_vocab"], inference["inv_rel_vocab"], self.delimiter
        )
        return train, inference, valid, test

    def _valid_num_nodes(self, train, valid):
        return valid["num_node"]  # datasets.py:970


class FBNELL(MTDEAInductive):
    name = "FBNELL"
    versions = ["FBNELL_v1"]

    def __init__(self, root, version=None, **kwargs):
        super().__init__(root, self.versions[0], **kwargs)


class Metafam(MTDEAInductive):
    name = "Metafam"
    versions = ["Metafam"]

    def __init__(self, root, version=None, **kwargs):
        super().__init__(root, self.versions[0], **kwargs)


class WikiTopicsMT1(MTDEAInductive):
    name = "WikiTopics-MT1"
    prefix = "wikidata_%sv1"
    versions = ["mt", "health", "tax"]


class WikiTopicsMT2(MTDEAInductive):
    name = "WikiTopics-MT2"
    prefix = "wikidata_%sv1"
    versions = ["mt2", "org", "sci"]


class WikiTopicsMT3(MTDEAInductive):
    name = "WikiTopics-MT3"
    prefix = "wikidata_%sv2"
    versions = ["mt3", "art", "infra"]


class WikiTopicsMT4(MTDEAInductive):
    name = "WikiTopics-MT4"
    prefix = "wikidata_%sv2"
    versions = ["mt4", "sci", "health"]


# ---------------------------------------------------------------------------
# offline synthetic rule-KGs (no reference counterpart): first-class datasets
# for the no-network transfer experiments — planted compositional rules give
# learnable, vocabulary-independent structure (synthetic.rule_kg_splits)
# ---------------------------------------------------------------------------


class SyntheticRuleKG(TransductiveDataset):
    """Deterministic offline rule-KG. Parameters arrive as constructor
    kwargs (``build_dataset(name, root, **cfg)`` passes YAML dataset keys
    straight through), the name encodes them, and ``download`` writes the
    raw split files instead of fetching URLs — everything downstream
    (vocab accumulation, inverse augmentation, relation graph, caching)
    is the standard TransductiveDataset path."""

    urls = ()
    num_nodes = 2000
    num_base_rel = 16
    num_comp_rel = 8
    num_base_triples = 12000
    seed = 0
    categories = 8
    rule_keep = 0.75

    def __init__(self, root: str, **kwargs):
        super().__init__(root, **kwargs)
        self.name = (
            f"synthrule-v{self.num_nodes}-b{self.num_base_rel}"
            f"-c{self.num_comp_rel}-e{self.num_base_triples}-s{self.seed}"
        )

    def download(self):
        from ultra_tpu.data.synthetic import rule_kg_splits

        train, valid, test, _ = rule_kg_splits(
            self.num_nodes, self.num_base_rel, self.num_comp_rel,
            self.num_base_triples, seed=self.seed,
            categories=self.categories, rule_keep=self.rule_keep,
        )
        os.makedirs(self.raw_dir, exist_ok=True)
        for path, trip in zip(self.raw_paths(), (train, valid, test)):
            with open(path, "w", encoding="utf-8") as f:
                for h, t, r in trip:
                    f.write(f"e{h}\tr{r}\te{t}\n")


# ---------------------------------------------------------------------------
# joint pretraining mixture (datasets.py:1051-1095)
# ---------------------------------------------------------------------------


class JointDataset:
    datasets_map = {
        "FB15k237": FB15k237,
        "WN18RR": WN18RR,
        "CoDExSmall": CoDExSmall,
        "CoDExMedium": CoDExMedium,
        "CoDExLarge": CoDExLarge,
        "NELL995": NELL995,
        "ConceptNet100k": ConceptNet100k,
        "DBpedia100k": DBpedia100k,
        "YAGO310": YAGO310,
        "AristoV4": AristoV4,
    }

    def __init__(self, root: str, graphs: Sequence):
        self.root = root
        self.graph_names = list(graphs)

    def load(self) -> List[KGDataset]:
        out = []
        for g in self.graph_names:
            if isinstance(g, str):
                out.append(self.datasets_map[g](self.root).load())
            else:
                # parameterized member: {class: SyntheticRuleKG, seed: 3, ...}
                cfg = dict(g)
                cls = DATASETS[cfg.pop("class")]
                out.append(cls(self.root, **cfg).load())
        return out


# ---------------------------------------------------------------------------
# registry mirroring util.build_dataset's `getattr(datasets, cls)` pattern
# (util.py:144-164)
# ---------------------------------------------------------------------------

DATASETS: Dict[str, type] = {
    "FB15k237": FB15k237,
    "WN18RR": WN18RR,
    "CoDExSmall": CoDExSmall,
    "CoDExMedium": CoDExMedium,
    "CoDExLarge": CoDExLarge,
    "NELL995": NELL995,
    "ConceptNet100k": ConceptNet100k,
    "DBpedia100k": DBpedia100k,
    "YAGO310": YAGO310,
    "Hetionet": Hetionet,
    "AristoV4": AristoV4,
    "WDsinger": WDsinger,
    "NELL23k": NELL23k,
    "FB15k237_10": FB15k237_10,
    "FB15k237_20": FB15k237_20,
    "FB15k237_50": FB15k237_50,
    "FB15k237Inductive": FB15k237Inductive,
    "WN18RRInductive": WN18RRInductive,
    "NELLInductive": NELLInductive,
    "ILPC2022": ILPC2022,
    "HM": HM,
    "FBIngram": FBIngram,
    "WKIngram": WKIngram,
    "NLIngram": NLIngram,
    "FBNELL": FBNELL,
    "Metafam": Metafam,
    "WikiTopicsMT1": WikiTopicsMT1,
    "WikiTopicsMT2": WikiTopicsMT2,
    "WikiTopicsMT3": WikiTopicsMT3,
    "WikiTopicsMT4": WikiTopicsMT4,
    "SyntheticRuleKG": SyntheticRuleKG,
    "JointDataset": JointDataset,
}
JointDataset.datasets_map["SyntheticRuleKG"] = SyntheticRuleKG

# datasets whose evaluation protocol is tail-only (README.md:264; run.py:133)
TAIL_ONLY_EVAL = {"WDsinger", "NELL23k", "FB15k237_10", "FB15k237_20", "FB15k237_50"}

# inductive dataset classes whose filtering graph comes from the inference
# graph (run.py:263-288)
INDUCTIVE_FILTER_WITH_INFERENCE = {"ILPC2022", "FBIngram", "WKIngram", "NLIngram"}


def build_dataset(name: str, root: str, **kwargs):
    """Name-and-kwargs dataset factory (mirrors util.py:144-164)."""
    cls = DATASETS[name]
    if cls is JointDataset:
        return JointDataset(root, kwargs.pop("graphs"))
    return cls(root, **kwargs)


# ---------------------------------------------------------------------------
# device conversion
# ---------------------------------------------------------------------------


def split_to_graph(
    split: KGSplit,
    pad_edges_to: Optional[int] = None,
    pad_rel_edges_to: Optional[int] = None,
    with_plans: bool = False,
    plan_rb=None,
    plan_chunk: int = 128,
    pad_rel_edges_bucket: Optional[int] = None,
    v2_sort_slots: bool = False,
):
    """KGSplit -> device Graph with relation graph (and optional Pallas
    plans) attached.

    ``pad_rel_edges_bucket``: bucket the relation graph's ACTUAL edge count
    (which is data-dependent, up to 4*R^2 — a pre-computed pad can only
    guess) instead of a fixed ``pad_rel_edges_to``."""
    from ultra_tpu import tasks
    from ultra_tpu.graph import make_graph, pad_bucket

    rel_ei, rel_et = tasks.build_relation_graph_arrays(
        split.edge_index, split.edge_type, split.num_nodes, split.num_relations
    )
    if pad_rel_edges_bucket is not None:
        assert pad_rel_edges_to is None
        pad_rel_edges_to = pad_bucket(
            max(rel_ei.shape[1], 64), pad_rel_edges_bucket
        )
    rel_graph = make_graph(
        rel_ei, rel_et, num_nodes=split.num_relations, num_relations=4,
        pad_to=pad_rel_edges_to,
    )
    graph = make_graph(
        split.edge_index,
        split.edge_type,
        num_nodes=split.num_nodes,
        num_relations=split.num_relations,
        pad_to=pad_edges_to,
        relation_graph=rel_graph,
    )
    if with_plans:
        from ultra_tpu.ops.rspmm_pallas import attach_plans

        def host_padded(ei, et, e_pad):
            e = ei.shape[1]
            return (
                np.pad(np.asarray(ei, np.int64), ((0, 0), (0, e_pad - e))),
                np.pad(np.asarray(et, np.int64), (0, e_pad - e)),
                np.pad(np.ones(e, np.float32), (0, e_pad - e)),
            )

        rel_graph = attach_plans(
            rel_graph, rb=min(plan_rb, 128) if plan_rb else None, chunk=plan_chunk,
            host_edges=host_padded(rel_ei, rel_et, rel_graph.num_edges_padded),
        )
        graph = attach_plans(
            graph, rb=plan_rb, chunk=plan_chunk,
            host_edges=host_padded(
                split.edge_index, split.edge_type, graph.num_edges_padded
            ),
            v2_sort_slots=v2_sort_slots,
        )
        graph = graph.replace(relation_graph=rel_graph)
    return graph
