"""WordNet class-tree construction tooling.

Capability parity with `/root/reference/utils/categories.py` (:13-192):
derives the dataset class trees from the 9k.tree taxonomy plus the four
datasets' wn-id name files, writes the `mini[_det]` tree, applies the manual
`new_parents.tree` overrides and `removed_wn.tree` deletions to produce the
`filtered[_det]` tree, and emits the ascii `.treevis` visualisations.

Re-built dependency-free: the reference needs anytree + ete3 + treeswift +
nltk; here the tree is a plain parent-dict, rendering is a recursive walk,
and wn-id -> human-name uses nltk only when present (raw ids otherwise).
"""
from __future__ import annotations

import os
from collections import defaultdict
from typing import Dict, Iterable, List, Optional, Tuple

from ..data.base import ASSETS_DIR

TREES_DIR = os.path.join(ASSETS_DIR, "trees")
NAMES_DIR = os.path.join(ASSETS_DIR, "names")

__all__ = [
    "load_9k_taxonomy",
    "dataset_leaf_classes",
    "build_paths",
    "paths_to_parents",
    "apply_manual_filters",
    "render_tree",
    "write_tree_file",
    "build_trees",
]

# leaf paths absent from 9k.tree, filled in manually by the reference
# (categories.py:66-69, from imagenet.stanford.edu synset pages)
MANUAL_PATHS = {
    "n02870092": ["ROOT", "n00002684", "n00003553", "n00021939", "n03129123",
                  "n04007894", "n02870092"],
    "n03346898": ["ROOT", "n00002684", "n00003553", "n00021939", "n04564698",
                  "n03895293", "n03089014", "n04493505", "n03944672",
                  "n03206158", "n03550916", "n03346898"],
}


def id_to_name(wn_id: str) -> str:
    try:  # pragma: no cover
        from nltk.corpus import wordnet as wn

        return wn.synset_from_pos_and_offset("n", int(wn_id[1:]))._name
    except Exception:
        return wn_id


def load_9k_taxonomy(path: Optional[str] = None):
    """9k.tree rows are (wn_id, parent_row_index); -1 marks a root child."""
    path = path or os.path.join(TREES_DIR, "9k.tree")
    with open(path) as f:
        rows = [line.split() for line in f if line.strip()]
    by_index = {i: r[0] for i, r in enumerate(rows)}
    parent_index = {r[0]: int(r[1]) for r in rows}
    return by_index, parent_index


def dataset_leaf_classes(dsets: Iterable[str]) -> List[str]:
    classes = set()
    for dset in dsets:
        with open(os.path.join(NAMES_DIR, dset + "_wn.names")) as f:
            classes.update(line.strip() for line in f if line.strip())
    return sorted(classes)


def build_paths(classes: Iterable[str]) -> Dict[str, List[str]]:
    """Root-first ancestor path for each leaf class (categories.py:43-64)."""
    by_index, parent_index = load_9k_taxonomy()
    paths = dict(MANUAL_PATHS)
    for cls in classes:
        if cls in paths:
            continue
        if cls not in parent_index:
            continue  # unknown to the taxonomy and no manual path
        path, c = [], cls
        while True:
            path.append(c)
            if parent_index[c] < 0:
                path.append("ROOT")
                path.reverse()
                paths[cls] = path
                break
            c = by_index[parent_index[c]]
    return paths


def paths_to_parents(paths: Dict[str, List[str]]) -> Dict[str, str]:
    parents: Dict[str, str] = {}
    for path in paths.values():
        for i in range(1, len(path)):
            prev = parents.get(path[i])
            assert prev is None or prev == path[i - 1], (
                f"conflicting parents for {path[i]}"
            )
            parents[path[i]] = path[i - 1]
    return parents


def apply_manual_filters(parents: Dict[str, str]) -> Dict[str, str]:
    """new_parents.tree overrides + removed_wn.tree deletions (grandparent
    re-assignment) (categories.py:116-139)."""
    parents = dict(parents)
    with open(os.path.join(TREES_DIR, "new_parents.tree")) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2:
                parents[parts[0]] = parts[1]
    with open(os.path.join(TREES_DIR, "removed_wn.tree")) as f:
        removed = [line.strip() for line in f if line.strip()]
    for wnid in removed:
        for c, p in list(parents.items()):
            if p == wnid:
                parents[c] = parents[wnid]
        parents.pop(wnid, None)
    return parents


def _children_map(parents: Dict[str, str]) -> Dict[str, List[str]]:
    children = defaultdict(list)
    for c, p in parents.items():
        children[p].append(c)
    return children


def render_tree(parents: Dict[str, str], human_names: bool = False) -> str:
    """anytree.RenderTree-style ascii rendering (categories.py:89-108)."""
    children = _children_map(parents)
    lines: List[str] = []

    def walk(node: str, prefix: str, is_last: bool, is_root: bool):
        if is_root:
            lines.append(node)
            child_prefix = ""
        else:
            branch = "└── " if is_last else "├── "
            name = id_to_name(node) if human_names and node != "ROOT" else node
            lines.append(prefix + branch + name)
            child_prefix = prefix + ("    " if is_last else "│   ")
        kids = sorted(children.get(node, []))
        for i, k in enumerate(kids):
            walk(k, child_prefix, i == len(kids) - 1, False)

    walk("ROOT", "", True, True)
    return "\n".join(lines) + "\n"


def write_tree_file(parents: Dict[str, str], path: str):
    """Level-order `wnid<TAB>parent` rows (categories.py:109-113)."""
    children = _children_map(parents)
    order, frontier = [], ["ROOT"]
    while frontier:
        nxt = []
        for n in frontier:
            kids = sorted(children.get(n, []))
            order.extend(kids)
            nxt.extend(kids)
        frontier = nxt
    with open(path, "w") as f:
        for node in order:
            f.write(f"{node}\t{parents[node]}\n")


def build_trees(
    dsets: Tuple[str, ...] = ("pascalvoc", "coco", "imagenetdet", "imagenetvid"),
    out_dir: Optional[str] = None,
):
    """Full pipeline: mini + filtered trees and treevis files."""
    out_dir = out_dir or TREES_DIR
    suffix = "_det" if "imagenetdet" in dsets else ""
    classes = dataset_leaf_classes(dsets)
    paths = build_paths(classes)
    parents = paths_to_parents({c: p for c, p in paths.items() if c in classes})

    with open(os.path.join(out_dir, f"mini_wn{suffix}.treevis"), "w") as f:
        f.write(render_tree(parents))
    with open(os.path.join(out_dir, f"mini{suffix}.treevis"), "w") as f:
        f.write(render_tree(parents, human_names=True))
    write_tree_file(parents, os.path.join(out_dir, f"mini{suffix}.tree"))

    filtered = apply_manual_filters(parents)
    with open(os.path.join(out_dir, f"filtered_wn{suffix}.treevis"), "w") as f:
        f.write(render_tree(filtered))
    with open(os.path.join(out_dir, f"filtered{suffix}.treevis"), "w") as f:
        f.write(render_tree(filtered, human_names=True))
    write_tree_file(filtered, os.path.join(out_dir, f"filtered{suffix}.tree"))
    return filtered


if __name__ == "__main__":
    build_trees()
