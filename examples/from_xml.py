"""Load a declarative XML scene and run the sequential driver.

Run:  PYTHONPATH=. python examples/from_xml.py
"""

import os

from rts_tpu.sim import load_world, run
from rts_tpu.sim.export import save_responses


def main():
    path = os.path.join(os.path.dirname(__file__), "scene.xml")
    world, params = load_world(path)
    summary = run(world, params, verbose=True)
    print(f"total responses: {summary.total_responses}")
    for rx in world.receivers:
        print(f"  {rx.name}: {len(rx.responses)} responses")
    save_responses("/tmp/responses.npz", world)
    print("saved /tmp/responses.npz")


if __name__ == "__main__":
    main()
