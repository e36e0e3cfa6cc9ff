""".g2o text format reader/writer.

Reimplements the semantics of OptimizableGraph::load/save
(g2o/core/optimizable_graph.cpp:356-569, 589-910) against the declarative
type registry instead of per-class read()/write() virtuals:

* ``PARAMS_*`` lines are read in a pre-pass before everything else
  (optimizable_graph.cpp:359),
* vertex lines: ``TAG id <estimate...>``,
* edge lines: ``TAG id1 ... idk [param ids...] <measurement...>
  <upper-triangular information...>`` (vertex ids are consumed by the loader,
  parameter ids by the edge's own read — optimizable_graph.cpp:454-505 +
  e.g. edge_se3_pointxyz.cpp:62-79),
* ``FIX id...`` lines (optimizable_graph.cpp:390-403),
* ``#`` comments; unknown tags are collected and reported, not fatal,
* missing endpoints of binary edges are auto-created at the origin
  (optimizable_graph.cpp:460-478); the reference then runs the edge's
  initialEstimate — we leave that to the spanning-tree initializer.

The hot path for large files is delegated to the native C++ tokenizer in
openslam_g2o_tpu/native when built (falls back to numpy parsing).
"""
from __future__ import annotations

import io as _io
from typing import Optional, TextIO, Union

import numpy as np

from openslam_g2o_tpu.core import registry
from openslam_g2o_tpu.core.graph import Graph


def _info_from_upper(values, d):
    m = np.zeros((d, d))
    iu = np.triu_indices(d)
    m[iu] = values
    m = m + m.T - np.diag(np.diag(m))
    return m


def _upper_from_info(m):
    d = m.shape[0]
    return m[np.triu_indices(d)]


def load_g2o(source: Union[str, TextIO], graph: Optional[Graph] = None,
             renamed_types: Optional[dict] = None) -> Graph:
    """Parse a .g2o file (path or file object) into a Graph."""
    if isinstance(source, str):
        with open(source, "r") as f:
            text = f.read()
    else:
        text = source.read()
    return loads_g2o(text, graph=graph, renamed_types=renamed_types)


def _tokenize_python(text: str):
    """Pure-Python fallback matching the native tokenizer's output shape."""
    out = []
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        toks = line.split()
        try:
            vals = np.array([float(t) for t in toks[1:]])
            out.append((toks[0], vals, None))
        except ValueError:
            out.append((toks[0], None, line))
    return out


def loads_g2o(text: str, graph: Optional[Graph] = None,
              renamed_types: Optional[dict] = None) -> Graph:
    graph = graph if graph is not None else Graph()
    renamed = renamed_types or {}
    unknown_tags: dict[str, int] = {}
    fixed_ids: list[int] = []

    from openslam_g2o_tpu import native
    tokenized = native.tokenize(text)
    if tokenized is None:
        tokenized = _tokenize_python(text)
    lines = []
    for tag, vals, raw in tokenized:
        tag = renamed.get(tag, tag)
        if vals is not None:
            lines.append((tag, vals, None))
        else:
            lines.append((tag, None, raw.split()[1:]))

    # pre-pass: parameters (ParameterContainer::read, optimizable_graph.cpp:359)
    for tag, vals, raw in lines:
        pt = registry.parameter_type_by_tag(tag)
        if pt is None or vals is None:
            continue
        pid = int(vals[0])
        pvals = vals[1:1 + pt.io_dim]
        if pt.from_file is not None:
            pvals = pt.from_file(pvals)
        graph.add_parameter(pid, pt.name, pvals)

    from openslam_g2o_tpu.models.data import parse_data_line

    last_vertex = None
    for tag, vals, raw in lines:
        if registry.parameter_type_by_tag(tag) is not None:
            continue
        if tag == "FIX" and vals is not None:
            fixed_ids.extend(int(v) for v in vals)
            continue

        vt = registry.vertex_type_by_tag(tag)
        if vt is not None and vals is not None:
            vid = int(vals[0])
            v = vals[1:1 + vt.io_dim]
            if vt.from_file is not None:
                v = vt.from_file(v)
            last_vertex = graph.add_vertex(vid, vt.name, v)
            continue

        # data payload lines attach to the preceding vertex
        # (optimizable_graph.cpp:541-565); they contain non-numeric tokens so
        # they arrive through the raw fallback
        if raw is not None:
            payload = parse_data_line(tag, raw)
            if payload is not None:
                if last_vertex is not None:
                    last_vertex.data.append(payload)
                continue

        et = registry.edge_type_by_tag(tag)
        if et is not None and vals is not None:
            k = et.num_vertices
            pos = 0
            vids = [int(v) for v in vals[pos:pos + k]]
            pos += k
            nparams = len(et.param_types)
            pids = [int(v) for v in vals[pos:pos + nparams]]
            pos += nparams
            md = et.io_meas_dim
            meas = vals[pos:pos + md]
            pos += md
            if et.from_file is not None:
                meas = et.from_file(meas)
            d = et.error_dim
            ninfo = d * (d + 1) // 2
            tri = vals[pos:pos + ninfo]
            if len(tri) != ninfo:
                raise ValueError(
                    f"edge {tag}: expected {ninfo} information entries, got {len(tri)}")
            info = _info_from_upper(tri, d)
            # auto-create missing endpoints at the origin
            for s, vid in enumerate(vids):
                if vid not in graph.vertices:
                    svt = registry.vertex_type(et.vertex_types[s])
                    origin = np.asarray(svt.origin(np.float64))
                    graph.add_vertex(vid, svt.name, origin)
            graph.add_edge(et.name, vids, meas, info, param_ids=pids)
            continue

        unknown_tags[tag] = unknown_tags.get(tag, 0) + 1

    for vid in fixed_ids:
        if vid in graph.vertices:
            graph.set_fixed(vid, True)

    if unknown_tags:
        import sys
        print(f"load_g2o: skipped unknown tags: {unknown_tags}", file=sys.stderr)
    return graph


def save_g2o(graph: Graph, dest: Union[str, TextIO, None] = None) -> Optional[str]:
    """Serialize a Graph back to .g2o text. The text format *is* the
    checkpoint format, exactly as in the reference (optimizable_graph.cpp:806+)."""
    buf = _io.StringIO()

    def fmt(x):
        return np.format_float_positional(
            x, precision=None, unique=True, trim="0") if isinstance(x, float) else str(x)

    def fmtv(vals):
        return " ".join(repr(float(v)) for v in vals)

    for pid, (pt, vals) in sorted(graph.parameters.items()):
        out_vals = pt.to_file(vals) if pt.to_file is not None else vals
        buf.write(f"{pt.tag} {pid} {fmtv(out_vals)}\n")

    from openslam_g2o_tpu.models.data import format_data_line

    fixed = []
    for vid, rec in graph.vertices.items():
        vals = rec.params
        if rec.vtype.to_file is not None:
            vals = rec.vtype.to_file(vals)
        buf.write(f"{rec.vtype.tag} {vid} {fmtv(vals)}\n")
        for payload in rec.data:
            buf.write(format_data_line(payload) + "\n")
        if rec.fixed:
            fixed.append(vid)
    for vid in fixed:
        buf.write(f"FIX {vid}\n")

    for e in graph.edges:
        meas = e.measurement
        if e.etype.to_file is not None:
            meas = e.etype.to_file(meas)
        parts = [e.etype.tag]
        parts.extend(str(v) for v in e.vertex_ids)
        parts.extend(str(p) for p in e.param_ids)
        parts.append(fmtv(meas))
        parts.append(fmtv(_upper_from_info(e.information)))
        buf.write(" ".join(parts) + "\n")

    text = buf.getvalue()
    if dest is None:
        return text
    if isinstance(dest, str):
        with open(dest, "w") as f:
            f.write(text)
        return None
    dest.write(text)
    return None
