from chrono_tpu.fea.cable import CableMesh, CableProps, CableBuilder, internal_forces, total_energy, mass_matrix
from chrono_tpu.fea.dynamics import static_solve, make_hht_step, gravity_loads, make_force_fn
from chrono_tpu.fea.modal import fea_modes, eigenmodes, craig_bampton, linearized_KM
from chrono_tpu.fea.beam import BeamMesh, BeamProps, BeamBuilder
from chrono_tpu.fea.tetra import TetraMesh, TetraProps, TetraBuilder
from chrono_tpu.fea.contact import NodeCloudContact, make_contact_force_fn
from chrono_tpu.fea.ancf import (ANCFElement, ANCFMesh, beam_material_D0_Dv,
                                 build_ancf_element, build_ancf_mesh)
from chrono_tpu.fea.eig import (undamped_modes, damped_modes,
                                natural_frequencies, sym_pencil_eigs)
