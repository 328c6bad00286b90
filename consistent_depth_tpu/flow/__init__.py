from .backends import create_flow_backend, FlowBackend, PrecomputedFlowBackend  # noqa: F401
