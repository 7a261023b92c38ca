from chrono_tpu.ops.pallas.dem_cell_kernel import dem_cell_forces_pallas, edge_ok_table
