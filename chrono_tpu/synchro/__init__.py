from chrono_tpu.synchro.agents import (
    AgentFleet, make_fleet, fleet_step, SocketSync,
)
