from .direct import (ddpm_ancestral, ddim, ode_euler, sde_euler, ode_heun,
                     flow_euler)

__all__ = ["ddpm_ancestral", "ddim", "ode_euler", "sde_euler", "ode_heun",
           "flow_euler"]
