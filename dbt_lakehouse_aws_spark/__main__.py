from dbt_lakehouse_aws_spark.cli import main

raise SystemExit(main())
