"""Generate the markdown API reference under docs/api/.

Hand-rolled (no pdoc/sphinx in the environment): introspects the public
kbmod_tpu modules — classes, their public methods, and module-level
functions with signatures and docstring summaries — plus a full table of
all SearchConfiguration parameters. The reference ships a Sphinx tree
(docs/source/api_reference) serving the same role.

Run: ``python scripts/gen_api_docs.py [out_dir]`` (default docs/api).
tests/test_api_docs.py regenerates into a temp dir and fails if the
committed tree is stale.
"""

import importlib
import inspect
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Public modules, grouped as in docs/overview.md. Each entry is
# (module path, one-line role).
MODULES = [
    ("kbmod_tpu.configuration", "Search configuration (45 typed parameters)"),
    ("kbmod_tpu.search", "StackSearch + the kbmod.search compat surface"),
    ("kbmod_tpu.search.stack_search", "StackSearch implementation"),
    ("kbmod_tpu.search.trajectory", "Trajectory struct"),
    ("kbmod_tpu.search.trajectory_list", "TrajectoryList (struct-of-arrays)"),
    ("kbmod_tpu.run_search", "SearchRunner pipeline"),
    ("kbmod_tpu.results", "Results table, IO, filtered tracking"),
    ("kbmod_tpu.trajectory_generator", "Candidate-grid generators"),
    ("kbmod_tpu.trajectory_utils", "Trajectory prediction/fitting/matching"),
    ("kbmod_tpu.trajectory_explorer", "Interactive single-trajectory evaluation"),
    ("kbmod_tpu.core.image_stack_py", "ImageStackPy / LayeredImagePy"),
    ("kbmod_tpu.core.psf", "PSF kernels and masked convolution"),
    ("kbmod_tpu.core.stamp_utils", "Stamp cutouts and coadds"),
    ("kbmod_tpu.core.shift_and_stack", "psi/phi generation (compat shim)"),
    ("kbmod_tpu.ops.psi_phi", "On-device psi/phi build + quantization"),
    ("kbmod_tpu.ops.search", "Core trajectory-scoring kernels (XLA)"),
    ("kbmod_tpu.ops.search_pallas", "Pallas TPU kernels (packed/grouped/uniform)"),
    ("kbmod_tpu.ops.stamps", "On-device stamp coadds"),
    ("kbmod_tpu.ops.reproject", "On-device adaptive reprojection"),
    ("kbmod_tpu.ops.convolve", "Masked PSF convolution"),
    ("kbmod_tpu.filters.sigma_g_filter", "Sigma-G clipping"),
    ("kbmod_tpu.filters.clustering_filters", "DBSCAN / NN-sweep clustering"),
    ("kbmod_tpu.filters.clustering_grid", "Grid clustering + near-dup prefilter"),
    ("kbmod_tpu.filters.stamp_filters", "Coadds, all-stamps, CNN vetting"),
    ("kbmod_tpu.filters.brightness_filters", "Brightness-consistency scoring"),
    ("kbmod_tpu.filters.known_object_filters", "Known-object ephemeris matching"),
    ("kbmod_tpu.filters.sns_filters", "Peak-offset + predictive line cluster"),
    ("kbmod_tpu.models.cnn", "Flax ResNet vetting models + torch conversion"),
    ("kbmod_tpu.standardizers.standardizer", "Standardizer ABC + plugin registry"),
    ("kbmod_tpu.standardizers.fits_standardizer", "FITS standardizer bases"),
    ("kbmod_tpu.standardizers.kbmodv1", "Rubin imdiff (KBMOD V1) standardizer"),
    ("kbmod_tpu.standardizers.kbmodv05", "Legacy DECam (KBMOD V0.5) standardizer"),
    ("kbmod_tpu.standardizers.butler_standardizer", "LSST Butler standardizer"),
    ("kbmod_tpu.image_collection", "ImageCollection metadata catalog"),
    ("kbmod_tpu.work_unit", "WorkUnit container + FITS layouts"),
    ("kbmod_tpu.reprojection", "WorkUnit reprojection drivers"),
    ("kbmod_tpu.reprojection_utils", "Parallax / barycentric corrections"),
    ("kbmod_tpu.wcs_utils", "WCS helpers"),
    ("kbmod_tpu.geom.wcs", "Self-contained SIP-capable WCS"),
    ("kbmod_tpu.region_search", "Survey-scale patch pre-search"),
    ("kbmod_tpu.injection", "Synthetic source injection + recovery"),
    ("kbmod_tpu.fake_data.fake_data_creator", "Fake image stacks"),
    ("kbmod_tpu.fake_data.fake_result_creator", "Fake results"),
    ("kbmod_tpu.parallel.sharded", "Multi-chip sharded search (mesh)"),
    ("kbmod_tpu.parallel.distributed", "Multi-host process groups + patch assignment"),
    ("kbmod_tpu.search.checkpoint", "Per-tile search checkpoint/resume"),
    ("kbmod_tpu.analysis.plotting", "Matplotlib result plotting"),
    ("kbmod_tpu.analysis.visualizer", "Interactive visualizer"),
    ("kbmod_tpu.analysis.results_rater", "Manual result rating"),
    ("kbmod_tpu.analysis.analyze_fakes", "Fake-recovery analysis"),
    ("kbmod_tpu.util_functions", "Shared utilities"),
    ("kbmod_tpu.utils.debug_timer", "DebugTimer"),
]


def _summary(obj):
    doc = inspect.getdoc(obj) or ""
    first = doc.split("\n\n", 1)[0].replace("\n", " ").strip()
    return first


def _signature(obj):
    try:
        sig = str(inspect.signature(obj))
    except (TypeError, ValueError):
        return "(...)"
    # Default-value reprs of live objects embed memory addresses, which
    # would make the generated pages non-deterministic.
    return re.sub(r" at 0x[0-9a-f]+", "", sig)


def _public_members(mod):
    names = getattr(mod, "__all__", None)
    classes, functions = [], []
    for name, obj in sorted(vars(mod).items()):
        if name.startswith("_"):
            continue
        if names is not None and name not in names:
            continue
        if getattr(obj, "__module__", None) != mod.__name__:
            continue
        if inspect.isclass(obj):
            classes.append((name, obj))
        elif inspect.isfunction(obj):
            functions.append((name, obj))
    return classes, functions


def render_module(modpath, role):
    try:
        mod = importlib.import_module(modpath)
    except ImportError as exc:
        # Optional-dependency modules (e.g. the Butler standardizer needs
        # the LSST middleware) still get a stub page.
        return (
            f"# `{modpath}`\n\n{role}.\n\n"
            f"*Not importable in this environment ({exc}); requires the "
            "optional dependency named above.*\n"
        )
    classes, functions = _public_members(mod)
    lines = [f"# `{modpath}`", "", role + ".", ""]
    mod_doc = _summary(mod)
    if mod_doc:
        lines += [mod_doc, ""]
    for name, cls in classes:
        lines += [f"## class `{name}`", ""]
        s = _summary(cls)
        if s:
            lines += [s, ""]
        try:
            init_sig = _signature(cls.__init__)
            lines += [f"- `__init__{init_sig}`"]
        except Exception:
            pass
        for mname, meth in sorted(vars(cls).items()):
            if mname.startswith("_"):
                continue
            target = meth
            if isinstance(meth, (staticmethod, classmethod)):
                target = meth.__func__
            elif isinstance(meth, property):
                doc = _summary(meth.fget) if meth.fget else ""
                lines += [f"- `{mname}` (property){' — ' + doc if doc else ''}"]
                continue
            if not inspect.isfunction(target):
                continue
            doc = _summary(target)
            lines += [f"- `{mname}{_signature(target)}`{' — ' + doc if doc else ''}"]
        lines += [""]
    if functions:
        lines += ["## Functions", ""]
        for name, fn in functions:
            doc = _summary(fn)
            lines += [f"- `{name}{_signature(fn)}`{' — ' + doc if doc else ''}"]
        lines += [""]
    return "\n".join(lines) + "\n"


def render_configuration_params():
    from kbmod_tpu.configuration import _SUPPORTED_PARAMS

    by_section = {}
    for p in _SUPPORTED_PARAMS:
        by_section.setdefault(p.section, []).append(p)
    lines = [
        "# SearchConfiguration parameters",
        "",
        f"All {len(_SUPPORTED_PARAMS)} supported parameters (same names, defaults and "
        "sections as the reference's configuration.py:73-400). See also "
        "docs/search_params.md for usage guidance.",
        "",
    ]
    for section in sorted(by_section):
        lines += [f"## {section}", "", "| Parameter | Default | Description |", "|---|---|---|"]
        for p in sorted(by_section[section], key=lambda p: p.name):
            default = repr(p.default_value)
            desc = p.description.replace("|", "\\|")
            req = " **(required)**" if p.required else ""
            lines.append(f"| `{p.name}` | `{default}` | {desc}{req} |")
        lines.append("")
    return "\n".join(lines) + "\n"


def render_index():
    lines = [
        "# kbmod_tpu API reference",
        "",
        "Generated by `scripts/gen_api_docs.py` — regenerate after changing any "
        "public signature or docstring (tests/test_api_docs.py enforces freshness).",
        "",
        "- [SearchConfiguration parameters](configuration_params.md)",
        "",
        "| Module | Role |",
        "|---|---|",
    ]
    for modpath, role in MODULES:
        lines.append(f"| [`{modpath}`]({modpath.replace('.', '_')}.md) | {role} |")
    lines += [
        "",
        "Narrative guides: [overview](../overview.md), [tutorial](../tutorial.md), "
        "[search params](../search_params.md), [input](../input_files.md) / "
        "[output](../output_files.md) files, [search space](../search_space.md), "
        "[filtering](../results_filtering.md), [reprojection](../reprojection.md), "
        "[env vars](../env_vars.md), [worked examples](../examples/).",
        "",
    ]
    return "\n".join(lines) + "\n"


def generate(out_dir):
    os.makedirs(out_dir, exist_ok=True)
    pages = {"index.md": render_index(), "configuration_params.md": render_configuration_params()}
    for modpath, role in MODULES:
        pages[modpath.replace(".", "_") + ".md"] = render_module(modpath, role)
    for name, text in pages.items():
        with open(os.path.join(out_dir, name), "w") as f:
            f.write(text)
    return sorted(pages)


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "docs", "api"
    )
    names = generate(out)
    print(f"wrote {len(names)} pages to {out}")
