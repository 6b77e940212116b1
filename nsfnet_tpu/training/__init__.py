from nsfnet_tpu.training.solver import PINNSolver, PysicsInformedNeuralNetwork

__all__ = ["PINNSolver", "PysicsInformedNeuralNetwork"]
