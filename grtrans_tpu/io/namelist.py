"""Fortran-namelist input files with reference grtrans parity.

The reference is driven by `files.in` (&files ifile, ofile;
grtrans_program.f90:4-11) pointing at an inputs file of six namelists
(&geodata &fluiddata &emisdata &general &harm &analytic;
read_inputs.f90:8-20, template inputs.in.dist), written from Python by
grtrans_batch.write_grtrans_inputs / namelist.py.  This module reads
and writes that exact format and maps it onto GrtransConfig, so
existing reference input files drive the new framework unchanged.
"""

import re

from grtrans_tpu.config import GrtransConfig


def _parse_value(tok):
    tok = tok.strip()
    if not tok:
        return None
    if tok[0] in "'\"":
        return tok.strip("'\"")
    low = tok.lower().rstrip(".")
    if low in (".true.", "t", "true"):
        return True
    if low in (".false.", "f", "false"):
        return False
    try:
        return int(tok)
    except ValueError:
        pass
    try:
        return float(tok)
    except ValueError:
        return tok


def parse_namelists(text):
    """Parse namelist text -> {group: {key: value-or-tuple}}."""
    groups = {}
    current = None
    for raw in text.splitlines():
        line = raw.split("!")[0].strip()
        if not line:
            continue
        if line.startswith("&"):
            current = line[1:].strip().lower()
            groups[current] = {}
            continue
        if line.startswith("/"):
            current = None
            continue
        if current is None or "=" not in line:
            continue
        key, _, val = line.partition("=")
        vals = [v for v in re.split(r",(?=(?:[^']*'[^']*')*[^']*$)",
                                    val.strip().rstrip(","))
                if v.strip() != ""]
        parsed = [_parse_value(v) for v in vals]
        groups[current][key.strip().lower()] = (
            parsed[0] if len(parsed) == 1 else tuple(parsed))
    return groups


def read_files_in(path="files.in"):
    """&files ifile, ofile (grtrans_program.f90:4-11)."""
    g = parse_namelists(open(path).read())
    files = g.get("files", {})
    return files.get("ifile"), files.get("ofile")


# GrtransConfig fields fed directly from the four core namelists
_CORE_KEYS = {
    "standard", "mumin", "mumax", "nmu", "phi0", "spin", "uout", "uin",
    "rcut", "nrotype", "gridvals", "nn", "i1", "i2", "extra", "debug",
    "fname", "dt", "nt", "nload", "nmdot", "mdotmin", "mdotmax",
    "sigcut", "ename", "mbh", "nfreq", "fmin", "fmax", "muval", "gmin",
    "gmax", "p1", "p2", "jetalpha", "stype", "use_geokerr", "nvals",
    "iname", "cflag",
}

# harm/analytic-group names (f-prefix stripped) -> our model kwargs
_FARG_RENAMES = {
    "nscl": "n0", "tscl": "t0", "nnthscl": "nnth0", "nnthp": "pnth",
    "np": "pn", "tp": "pt",
}


def config_from_groups(groups):
    """Six reference namelists -> GrtransConfig (+ fargs)."""
    kw = {}
    fargs = {}
    for gname, vals in groups.items():
        for key, v in vals.items():
            if gname in ("geodata", "fluiddata", "emisdata", "general"):
                if key in _CORE_KEYS:
                    kw[key] = v
                elif key == "delta":
                    kw.setdefault("epotherargs", (v,))
                elif key == "coefindx":
                    kw["epcoefindx"] = v if isinstance(v, tuple) else (v,)
                # nweights handled through epotherargs defaulting
            else:
                # model-parameter groups: strip the reference's 'f'
                # prefix (fdfile -> dfile, fnscl -> nscl -> n0, ...)
                k = key[1:] if key.startswith("f") and len(key) > 1 \
                    else key
                fargs[_FARG_RENAMES.get(k, k)] = v
    if "stype" in kw and isinstance(kw["stype"], str):
        kw["stype"] = kw["stype"].lower()
    cfg = GrtransConfig(**kw)
    cfg.fargs = _filter_fargs(cfg.fname, fargs)
    return cfg


def _filter_fargs(fname, fargs):
    """Keep only parameters the target fluid model accepts (the
    reference passes a flat 40+ member fluid_args bag, fluid.f90:59-66;
    our models take typed kwargs)."""
    import dataclasses
    from grtrans_tpu.fluid.base import _REGISTRY, _import_all_models
    _import_all_models()
    cls = _REGISTRY.get(fname.upper())
    if cls is None or not dataclasses.is_dataclass(cls):
        return fargs
    fields = {f.name for f in dataclasses.fields(cls)}
    return {k: v for k, v in fargs.items() if k in fields}


def read_inputs(path):
    """inputs.in -> GrtransConfig."""
    return config_from_groups(parse_namelists(open(path).read()))


def _fmt(v):
    if isinstance(v, bool):
        return "T" if v else "F"
    if isinstance(v, str):
        return f"'{v}'"
    if isinstance(v, (tuple, list)):
        return ",".join(_fmt(x) for x in v)
    return str(v)


def write_inputs(cfg: GrtransConfig, path, fargs_group="analytic"):
    """GrtransConfig -> reference-format namelist file (the layout of
    grtrans_batch.grtrans_inputs.write / inputs.in.dist)."""
    geod = ["standard", "mumin", "mumax", "nmu", "phi0", "spin", "uout",
            "uin", "rcut", "nrotype", "gridvals", "nn", "i1", "i2",
            "extra", "debug"]
    flud = ["fname", "dt", "nt", "nload", "nmdot", "mdotmin", "mdotmax",
            "sigcut"]
    emis = ["ename", "mbh", "nfreq", "fmin", "fmax", "muval", "gmin",
            "gmax", "p1", "p2", "jetalpha", "stype"]
    genl = ["use_geokerr", "nvals", "iname", "cflag"]
    with open(path, "w") as f:
        for group, keys in (("geodata", geod), ("fluiddata", flud),
                            ("emisdata", emis), ("general", genl)):
            f.write(f"&{group}\n")
            for k in keys:
                f.write(f" {k}={_fmt(getattr(cfg, k))},\n")
            if group == "emisdata" and cfg.epcoefindx is not None:
                f.write(f" coefindx={_fmt(cfg.epcoefindx)},\n")
            f.write("/\n")
        f.write(f"&{fargs_group}\n")
        for k, v in cfg.fargs.items():
            f.write(f" f{k}={_fmt(v)},\n")
        f.write("/\n")


def write_files_in(ifile, ofile, path="files.in"):
    with open(path, "w") as f:
        f.write(f"&files\n ifile='{ifile}',\n ofile='{ofile}',\n/\n")
