"""Shared test fixtures: small molecules + synthetic model builder."""

import math

import numpy as np

BENZENE_SDF = """benzene
  test

  6  6  0  0  0  0  0  0  0  0999 V2000
    0.0000    1.3960    0.0000 C   0  0
    1.2090    0.6980    0.0000 C   0  0
    1.2090   -0.6980    0.0000 C   0  0
    0.0000   -1.3960    0.0000 C   0  0
   -1.2090   -0.6980    0.0000 C   0  0
   -1.2090    0.6980    0.0000 C   0  0
  1  2  2  0
  2  3  1  0
  3  4  2  0
  4  5  1  0
  5  6  2  0
  6  1  1  0
M  END
$$$$
"""

PYRIDINE_SDF = """pyridine
  test

  6  6  0  0  0  0  0  0  0  0999 V2000
    0.0000    1.3960    0.0000 N   0  0
    1.2090    0.6980    0.0000 C   0  0
    1.2090   -0.6980    0.0000 C   0  0
    0.0000   -1.3960    0.0000 C   0  0
   -1.2090   -0.6980    0.0000 C   0  0
   -1.2090    0.6980    0.0000 C   0  0
  1  2  2  0
  2  3  1  0
  3  4  2  0
  4  5  1  0
  5  6  2  0
  6  1  1  0
M  END
$$$$
"""

ACETATE_SDF = """acetate
  test

  4  3  0  0  0  0  0  0  0  0999 V2000
    0.0000    0.0000    0.0000 C   0  0
    1.5000    0.0000    0.0000 C   0  0
    2.1000    1.1000    0.0000 O   0  0
    2.1000   -1.1000    0.0000 O   0  0
  1  2  1  0
  2  3  2  0
  2  4  1  0
M  CHG  1   4  -1
M  END
$$$$
"""

ETHANOL_SDF = """ethanol
  test

  3  2  0  0  0  0  0  0  0  0999 V2000
    0.0000    0.0000    0.0000 C   0  0
    1.5000    0.0000    0.0000 C   0  0
    2.2000    1.2000    0.0000 O   0  0
  1  2  1  0
  2  3  1  0
M  END
$$$$
"""


def _model_state(nodes, clusters):
    """Build a PharmacophoreModel state dict from simple node/cluster specs.

    nodes: [(pharmacophore_type, interaction_type, center, radius)]
    clusters: [(cluster_type, [node indices])]
    """
    n = len(nodes)
    edges = []
    edge_index = {}
    for i in range(n):
        for j in range(i, n):
            ci = np.array(nodes[i][2])
            cj = np.array(nodes[j][2])
            mean = float(np.linalg.norm(ci - cj))
            std = math.sqrt(nodes[i][3] ** 2 + nodes[j][3] ** 2)
            edge_index[(i, j)] = len(edges)
            edge_index[(j, i)] = len(edges)
            edges.append(
                dict(
                    index=len(edges),
                    node_indices=(i, j),
                    edge_type=(nodes[i][0], nodes[j][0]),
                    distance_mean=mean,
                    distance_std=std,
                )
            )
    node_dicts = []
    for i, (ptype, itype, center, radius) in enumerate(nodes):
        node_dicts.append(
            dict(
                index=i,
                type=ptype,
                interaction_type=itype,
                hotspot_position=(0.0, 0.0, 0.0),
                score=1.0,
                center=tuple(center),
                radius=radius,
                neighbor_edge_dict={j: edge_index[(i, j)] for j in range(n)},
                overlapped_nodes=[],
            )
        )
    cluster_dict = {k: [] for k in ["Cation", "Anion", "HBond", "Aromatic", "Hydrophobic", "Halogen"]}
    for ctype, idxs in clusters:
        centers = np.array([nodes[i][2] for i in idxs])
        center = centers.mean(axis=0)
        radii = np.array([nodes[i][3] * 2 for i in idxs])
        size = float(np.max(np.linalg.norm(centers - center, axis=-1) + radii))
        cluster_dict[ctype].append(
            dict(
                cluster_type=ctype,
                node_indices=tuple(idxs),
                node_types=tuple({nodes[i][0] for i in idxs}),
                center=tuple(center.tolist()),
                size=size,
            )
        )
    interaction_types = {
        "Hydrophobic": "Hydrophobic", "Aromatic": "PiStacking_P", "Cation": "PiCation_pring",
        "Anion": "SaltBridge_lneg", "HBond_donor": "HBond_ldon",
        "HBond_acceptor": "HBond_pdon", "Halogen": "XBond",
    }
    node_dict = {t: [] for t in interaction_types.values()}
    for i, (ptype, itype, _, _) in enumerate(nodes):
        node_dict.setdefault(itype, []).append(i)
    return dict(
        pdbblock="",
        nodes=node_dicts,
        edges=edges,
        node_cluster_dict=cluster_dict,
        node_dict=node_dict,
    )


