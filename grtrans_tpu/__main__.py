"""CLI entry point with reference `./grtrans` parity.

The reference binary reads `files.in` (&files ifile, ofile), parses the
six input namelists, runs the render, and writes a FITS or raw binary
camera file (grtrans_program.f90 + grtrans.f90:34-46).  Usage:

    python -m grtrans_tpu [files.in]
    python -m grtrans_tpu --inputs inputs.in --output grtrans.out

Output format is FITS when ofile ends in .fits, else the reference raw
binary layout (camera.f90:322-341).
"""

import argparse
import sys

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(prog="grtrans_tpu")
    ap.add_argument("files_in", nargs="?", default="files.in",
                    help="&files namelist pointing at ifile/ofile")
    ap.add_argument("--inputs", help="inputs namelist (overrides files.in)")
    ap.add_argument("--output", help="output path (overrides files.in)")
    args = ap.parse_args(argv)

    from grtrans_tpu.io import namelist as nml
    if args.inputs:
        ifile, ofile = args.inputs, args.output or "grtrans.out"
    else:
        ifile, ofile = nml.read_files_in(args.files_in)
        if args.output:
            ofile = args.output
    cfg = nml.read_inputs(ifile)

    from grtrans_tpu.orchestrator import grtrans_run
    ivals, ab, freqs = grtrans_run(cfg, verbose=True)

    if cfg.debug and cfg.i1 > 0 and cfg.i1 == cfg.i2:
        # single-ray debug dump (reference debug=1 geodebug.out,
        # grtrans_driver.f90:91-110): every pipeline intermediate for
        # the selected pixel, re-integrable via tools.geodebug
        from grtrans_tpu.tools import geodebug
        gpath = str(ofile) + ".geodebug.npz"
        geodebug.dump_ray(cfg, cfg.i1, gpath)
        print(f"grtrans_tpu: wrote geodebug dump to {gpath}")

    ncams = ivals.shape[0]
    nx, ny = cfg.nn[0], cfg.nn[1]
    if cfg.i1 > 0 or cfg.i2 > 0:
        nx, ny = ivals.shape[1], 1
    keyvals = [np.array([freqs[i % len(freqs)]], np.float32)
               for i in range(ncams)]
    if str(ofile).endswith(".fits"):
        from grtrans_tpu.io.fitsio import write_fits
        write_fits(ofile, ab.T, [ivals[i] for i in range(ncams)],
                   cfg.camera_key_dicts()[:ncams])
    else:
        from grtrans_tpu.io.binio import write_camera_bin
        write_camera_bin(ofile, ab.T, [ivals[i] for i in range(ncams)],
                         keyvals, nx, ny)
    print(f"grtrans_tpu: wrote {ncams} camera(s) to {ofile}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
