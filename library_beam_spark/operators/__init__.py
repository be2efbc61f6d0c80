"""Engine operators.

Each module exposes named ``DataFrame -> DataFrame`` functions (the Spark
analog of the reference's PTransforms, main.py:183-232). Nothing in here
collects to the driver; everything composes into one Catalyst plan.
"""
