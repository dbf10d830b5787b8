"""Model layer: SMPL body models, mesh assets, flow composition, networks, runners."""
