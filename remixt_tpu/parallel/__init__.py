"""Device-mesh parallelism: restart fan-out (data-parallel analogue) and
chain-sharded message passing (sequence-parallel analogue)."""
