"""Conjugate heat transfer: fluid channel over a heated solid slab, with
the coupled adjoint d(outlet T)/d(bottom wall T).

Run:  python examples/cht_heated_plate.py
(see tests/test_cht.py for the full option dicts)"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import jax

jax.config.update("jax_enable_x64", True)

from test_cht import build  # reuse the verified case definition
from dafoam_tpu.coupling import CHTCoupling

fluid, solid = build()
cht = CHTCoupling(fluid, solid, "ymin", "ymax")
inf, ins = fluid.make_inputs(), solid.make_inputs()
sf, ss, infos = cht.solve_primal(fluid.init_state(), solid.init_state(),
                                 inf, ins, n_outer=25)
print("interface T mismatch:", float(cht.interface_mismatch(sf, ss, inf, ins)))
inf2, _ = cht._apply_coupling(inf, ins, sf, ss)
print("outlet mean T:", float(fluid.eval_function("Tout", sf, inf2)))
tot_f, tot_s, info = cht.solve_adjoint(sf, ss, inf, ins, "fluid", "Tout")
print("d(Tout)/d(T_hot):", float(tot_s["bc"]["T"]["ymin"]))
