"""Dependency network: Add/Resolve/All/Network/Validate/AddGroup/GetGroup
with undefined-dependency checking and cycle detection — semantics of the
reference's Tarjan-SCC implementation (dependency_network.go:14-162,
model/dependency_network.go:18-50), built on stdlib graphlib for ordering
plus an explicit SCC pass for cycle *reporting*. Pure driver-side Python:
migration DAGs are tiny; Spark is never involved.
"""

from __future__ import annotations

from graphlib import TopologicalSorter

__all__ = ["DependencyNetwork"]


class DependencyNetwork:
    def __init__(self) -> None:
        self._edges: dict[str, set[str]] = {}
        self._groups: dict[str, set[str]] = {}

    # -- mutation (dependency_network.go:24-60) ------------------------
    def add(self, name: str, *depends_on: str) -> None:
        self._edges.setdefault(name, set()).update(depends_on)

    def add_group(self, group: str, *members: str) -> None:
        self._groups.setdefault(group, set()).update(members)

    # -- inspection ----------------------------------------------------
    def resolve(self, name: str) -> set[str]:
        return set(self._edges.get(name, set()))

    def all(self) -> list[str]:
        return sorted(self._edges)

    def network(self) -> dict[str, set[str]]:
        return {k: set(v) for k, v in self._edges.items()}

    def get_group(self, group: str) -> set[str]:
        return set(self._groups.get(group, set()))

    # -- validation (dependency_network.go:94-122) ---------------------
    def validate(self) -> list[str]:
        """Undefined-dependency check + cycle detection; returns the list
        of problems (empty = valid), mirroring the reference's aggregated
        error catalog."""
        problems: list[str] = []
        defined = set(self._edges)
        for node, deps in self._edges.items():
            for dep in deps:
                if dep not in defined and dep not in self._groups:
                    problems.append(f"dependency {dep!r} of {node!r} is not defined")
        for cycle in self._find_cycles():
            problems.append("cycle detected: " + " -> ".join(cycle))
        return problems

    def _find_cycles(self) -> list[list[str]]:
        """All strongly connected components with a cycle, in one pass —
        iterative Tarjan, matching the reference's behavior of reporting
        EVERY cycle per validate (dependency_network.go:114-119) rather
        than graphlib's one-CycleError-at-a-time. A node is cyclic when
        its SCC has >1 member, or it depends on itself. Deterministic
        order: nodes visited sorted, members reported in discovery order."""
        graph = {k: sorted(v & set(self._edges)) for k, v in self._edges.items()}
        index: dict[str, int] = {}
        lowlink: dict[str, int] = {}
        on_stack: set[str] = set()
        stack: list[str] = []
        counter = [0]
        sccs: list[list[str]] = []

        for root in sorted(graph):
            if root in index:
                continue
            # iterative DFS: (node, iterator over its successors)
            work = [(root, iter(graph[root]))]
            index[root] = lowlink[root] = counter[0]
            counter[0] += 1
            stack.append(root)
            on_stack.add(root)
            while work:
                node, it = work[-1]
                advanced = False
                for succ in it:
                    if succ not in index:
                        index[succ] = lowlink[succ] = counter[0]
                        counter[0] += 1
                        stack.append(succ)
                        on_stack.add(succ)
                        work.append((succ, iter(graph[succ])))
                        advanced = True
                        break
                    if succ in on_stack:
                        lowlink[node] = min(lowlink[node], index[succ])
                if advanced:
                    continue
                work.pop()
                if work:
                    parent = work[-1][0]
                    lowlink[parent] = min(lowlink[parent], lowlink[node])
                if lowlink[node] == index[node]:
                    comp: list[str] = []
                    while True:
                        w = stack.pop()
                        on_stack.discard(w)
                        comp.append(w)
                        if w == node:
                            break
                    comp.reverse()
                    if len(comp) > 1 or comp[0] in graph.get(comp[0], []):
                        sccs.append(comp)
        return sccs

    # -- ordering ------------------------------------------------------
    def topological_order(self) -> list[str]:
        """Dependency-respecting execution order (dependencies first)."""
        ts = TopologicalSorter({k: v & set(self._edges) for k, v in self._edges.items()})
        return list(ts.static_order())

    def waves(self) -> list[list[str]]:
        """Parallel execution waves: each wave's members have all
        dependencies satisfied by earlier waves — the unit the
        orchestrator can submit concurrently (Spark scheduler
        parallelizes independent jobs)."""
        ts = TopologicalSorter({k: v & set(self._edges) for k, v in self._edges.items()})
        ts.prepare()
        out: list[list[str]] = []
        while ts.is_active():
            ready = list(ts.get_ready())
            if not ready:
                break
            out.append(sorted(ready))
            ts.done(*ready)
        return out
