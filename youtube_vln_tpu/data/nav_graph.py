"""R2R navigation graphs, precomputed distances, and heading chains.

Matches reference ``utils/dataset/common.py:40-100`` (graph construction
from connectivity JSONs with euclidean edge weights, distance tables,
heading computation via atan2(dx, dy) — heading measured from north/y).
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Sequence, Union

import networkx as nx
import numpy as np

PathLike = Union[str, Path]


def load_nav_graphs(scans: Sequence[str],
                    data_dir: PathLike = "data") -> Dict[str, nx.Graph]:
    graphs: Dict[str, nx.Graph] = {}
    for scan in scans:
        with open(Path(data_dir) / "connectivity"
                  / f"{scan}_connectivity.json") as f:
            items = json.load(f)
        g = nx.Graph()
        positions = {}
        for i, item in enumerate(items):
            if not item["included"]:
                continue
            pos_i = np.array([item["pose"][3], item["pose"][7],
                              item["pose"][11]])
            for j, conn in enumerate(item["unobstructed"]):
                if conn and items[j]["included"]:
                    positions[item["image_id"]] = pos_i
                    assert items[j]["unobstructed"][i], \
                        "Graph should be undirected"
                    pos_j = np.array([items[j]["pose"][3],
                                      items[j]["pose"][7],
                                      items[j]["pose"][11]])
                    g.add_edge(item["image_id"], items[j]["image_id"],
                               weight=float(np.linalg.norm(pos_i - pos_j)))
        nx.set_node_attributes(g, values=positions, name="position")
        graphs[scan] = g
    return graphs


def load_distances(scans: Sequence[str],
                   data_dir: PathLike = "data") -> Dict[str, Dict]:
    out = {}
    for scan in scans:
        with open(Path(data_dir) / "distances"
                  / f"{scan}_distances.json") as f:
            out[scan] = json.load(f)
    return out


def compute_distances(graph: nx.Graph) -> Dict[str, Dict[str, float]]:
    """All-pairs shortest paths (used when distance JSONs are absent,
    mirroring calculate-metrics.py:84-85)."""
    return {src: dict(d) for src, d
            in nx.all_pairs_dijkstra_path_length(graph)}


def get_viewpoints(scan_list, graphs, features_reader) -> Dict[str, set]:
    """Viewpoints present in both the nav graph and the feature reader
    (reference common.py:302-309)."""
    out = {}
    for scan in scan_list:
        graph_vps = set(graphs[scan].nodes())
        out[scan] = features_reader.viewpoints[scan] & graph_vps
    return out


def get_headings(g: nx.Graph, path: Sequence[str],
                 first_heading: float) -> List[float]:
    """Heading at each viewpoint: first is given, the rest point at the next
    node; heading measured clockwise from +y (reference common.py:85-100)."""
    pos = nx.get_node_attributes(g, "position")
    headings = [first_heading]
    for source, target in zip(path[:-1], path[1:]):
        dx = pos[target][0] - pos[source][0]
        dy = pos[target][1] - pos[source][1]
        headings.append(float(np.arctan2(dx, dy)))
    return headings
