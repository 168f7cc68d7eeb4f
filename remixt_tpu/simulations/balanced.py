"""Minimal breakpoint copy number via min-cost perfect matching.

Mirrors /root/reference/remixt/simulations/balanced.py:5-104. The reference
uses the external blossomv package for min-weight perfect matching; here the
matching runs on networkx's blossom implementation (min_weight_matching),
which suffices because the matching graph always admits a perfect matching
through the transverse edges.

Used only for simulation ground truth (the minimized true breakpoint copy
number the evaluation compares against).
"""

import networkx


def _min_weight_perfect_matching(edges):
    """Minimum-cost perfect matching over a dict {(u, v): cost}.

    Every node is guaranteed a zero-or-low-cost transverse partner by
    construction, so a maximum-cardinality matching is perfect.
    """
    G = networkx.Graph()
    for (u, v), cost in edges.items():
        G.add_edge(u, v, weight=cost)
    matching = networkx.min_weight_matching(G)
    # normalize to the same edge key orientation as the input
    selected = set()
    for u, v in matching:
        if (u, v) in edges:
            selected.add((u, v))
        else:
            selected.add((v, u))
    return selected


def identify_balanced_rearrangements(H):
    """Find a set of edges of multigraph H forming balanced alternating
    cycles, via min-cost perfect matching on a red/blue doubled graph.

    Nodes of H are breakends; edges carry a 'color' attribute: +1 for
    breakpoint (variant) edges, -1 for wild-type adjacency edges.
    """
    transverse_edge_cost = 1.

    M = networkx.Graph()
    for node in H.nodes():
        transverse_edge = []
        for color in (1, -1):
            colored_node = node + (color,)
            M.add_node(colored_node)
            transverse_edge.append(colored_node)
        M.add_edge(*transverse_edge, cost=transverse_edge_cost)

    for edge in H.edges(keys=True):
        edge_attr = H[edge[0]][edge[1]][edge[2]]
        color = edge_attr['color']
        colored_node_1 = edge[0] + (color,)
        colored_node_2 = edge[1] + (color,)
        M.add_edge(colored_node_1, colored_node_2, cost=0.)

    M1 = networkx.convert_node_labels_to_integers(M, label_attribute='node_tuple')

    edges = networkx.get_edge_attributes(M1, 'cost')
    for edge in edges.keys():
        if edge[0] == edge[1]:
            raise Exception('self loop {}'.format(M1[edge[0]][edge[1]]))

    min_cost_edges = _min_weight_perfect_matching(edges)

    assert set(min_cost_edges).issubset(edges.keys())
    remove_edges = set(edges.keys()).difference(min_cost_edges)
    M2 = M1.copy()
    M2.remove_edges_from(remove_edges)

    M3 = networkx.relabel_nodes(
        M2, mapping=networkx.get_node_attributes(M2, 'node_tuple'))

    # matched non-transverse edges trace the balanced cycles
    H1 = networkx.Graph()
    for edge in M3.edges():
        node_1 = edge[0][:-1]
        node_2 = edge[1][:-1]
        if node_1 == node_2:
            continue
        if H1.has_edge(node_1, node_2):
            H1.remove_edge(node_1, node_2)
        else:
            H1.add_edge(node_1, node_2)

    return H1


def minimize_breakpoint_copies(adjacencies, brk_cn):
    """Iteratively cancel balanced rearrangement cycles out of the breakpoint
    copy numbers, per clone, until none remain."""
    min_brk_cn = dict()
    for brk, cn in brk_cn.items():
        min_brk_cn[brk] = cn.copy()

    num_clones = max([cn.shape[0] for cn in brk_cn.values()])

    while True:
        has_changed = False

        for m in range(num_clones):
            H = networkx.MultiGraph()

            for brk, cn in min_brk_cn.items():
                if cn[m] > 0:
                    H.add_edge(*brk, color=1)

            for adj in adjacencies:
                for allele in (0, 1):
                    allele_adj = (((adj[0], allele), 1), ((adj[1], allele), 0))
                    H.add_edge(*allele_adj, color=-1)

            C = identify_balanced_rearrangements(H)

            for edge in C.edges():
                edge = frozenset(list(edge))
                if edge not in min_brk_cn:
                    adj = tuple(sorted([a[0][0] for a in edge]))
                    assert adj in adjacencies or adj[::-1] in adjacencies
                    continue
                assert min_brk_cn[edge][m] > 0
                min_brk_cn[edge][m] -= 1
                has_changed = True

        if not has_changed:
            break

    return min_brk_cn
