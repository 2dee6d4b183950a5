"""``demo_graph`` command: computation-graph inspection (SURVEY.md §2.20).

The reference walks torch ``grad_fn`` into graphviz; the JAX analogs are the
jaxpr (exact traced program) and the optimized HLO the compiler actually
runs.  Additionally renders the model *plan* (the explicit layer graph that
drives init/apply/import) as graphviz when available.
"""

from __future__ import annotations

import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

from . import make_parser, setup
from .common import build

_LOG = logging.getLogger(__name__)


def plan_to_dot(model) -> str:
    lines = ["digraph yolojax {", "  rankdir=TB;", '  node [shape=box, fontsize=10];']
    prev = "input"
    lines.append('  input [label="images (NHWC)"];')
    slots = {}
    for i, op in enumerate(model.plan):
        kind = op[0]
        name = f"op{i}"
        if kind == "conv":
            d = op[1]
            label = f"{d.name}: conv{d.ksize}x{d.ksize}/{d.stride} {d.in_ch}->{d.out_ch}"
            if d.groups > 1:
                label += " dw"
            lines.append(f'  {name} [label="{label}"];')
            lines.append(f"  {prev} -> {name};")
            prev = name
        elif kind == "pool":
            lines.append(f'  {name} [label="maxpool {op[1]}/{op[2]}"];')
            lines.append(f"  {prev} -> {name};")
            prev = name
        elif kind == "mark":
            slots[op[1]] = prev
        elif kind == "load":
            prev = slots[op[1]]
        elif kind == "reorg":
            lines.append(f'  {name} [label="reorg /{op[1]}"];')
            lines.append(f"  {prev} -> {name};")
            prev = name
        elif kind == "concat":
            lines.append(f'  {name} [label="concat"];')
            lines.append(f"  {prev} -> {name};")
            lines.append(f"  {slots[op[1]]} -> {name};")
            prev = name
    lines.append(f'  output [label="raw head"];')
    lines.append(f"  {prev} -> output;")
    lines.append("}")
    return "\n".join(lines)


def main(argv=None):
    parser = make_parser("dump the model graph: plan DOT, jaxpr, optimized HLO")
    parser.add_argument("--size", type=int, default=416)
    parser.add_argument("-o", "--output", default="demo_graph_out")
    args = parser.parse_args(argv)
    config = setup(args)

    category, anchors, model = build(config)
    params, state = model.init(jax.random.PRNGKey(0))
    x = jnp.zeros((1, args.size, args.size, 3), jnp.float32)
    os.makedirs(args.output, exist_ok=True)

    dot = plan_to_dot(model)
    with open(os.path.join(args.output, "plan.dot"), "w") as f:
        f.write(dot)
    try:
        import graphviz

        graphviz.Source(dot).render(os.path.join(args.output, "plan"), format="png",
                                    cleanup=True)
    except Exception as e:  # graphviz binary may be absent
        _LOG.info("graphviz render skipped: %s", e)

    fwd = lambda p, s, images: model.apply(p, s, images, train=False)[0]
    with open(os.path.join(args.output, "model.jaxpr"), "w") as f:
        f.write(str(jax.make_jaxpr(fwd)(params, state, x)))
    lowered = jax.jit(fwd).lower(params, state, x)
    with open(os.path.join(args.output, "model.hlo"), "w") as f:
        f.write(lowered.as_text())
    _LOG.info("wrote plan.dot / model.jaxpr / model.hlo under %s", args.output)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
