"""qoipp_tpu.ops"""
