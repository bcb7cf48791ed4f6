"""Pipeline + query operators, all partition-parallel DataFrame transforms."""
